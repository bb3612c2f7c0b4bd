"""Long-lived online serving: the reference is an ONLINE engine — its
Django view (/root/reference/search/retrieval/views.py:27-97) parses the
request, spellchecks the plain query, classifies it, retrieves top-k,
joins result ids to document metadata and renders, all per HTTP request
against app-startup state (index dict + spell dict loaded once,
reference apps.py).  This module is that serving surface for rayindex:

    python -m rayindex.serve --index /path/to/index --port 8080
    python -m rayindex.serve --store /path/to/snapshot_store --port 8080

``SearchApp`` holds the startup state — an ``IndexReader`` (or a
``ShardedSearchPool`` of Ray actors when ``--actors N`` is given: the
multi-node shape where each actor owns a disjoint shard subset) plus the
vocabulary spell dictionary — and serves framework-free dict responses;
the stdlib ``ThreadingHTTPServer`` wrapping is transport only, so tests
drive the handlers directly and any WSGI/ASGI front end could replace
it on a real deployment.

With ``--store`` the app serves the live version of a
:mod:`rayindex.snapshot` store and hot-swaps on ``/reload``: all engine
state (reader/pool/spell/version) lives in one immutable ``_Engine``
object and a reload builds a NEW engine then swaps the single reference
— in-flight requests keep the engine they grabbed at entry (version
dirs are immutable, old pool actors are reaped by GC once the last
in-flight request drops its handle), so a swap never tears a request.

Endpoints (all GET, JSON):
  /search?q=...&k=10[&lang=..][&scorer=..][&algorithm=..][&spellcheck=0]
      spellchecks plain queries BY DEFAULT (reference default-on,
      helpers.py:235-270; boolean/proximity/phrase queries pass through
      untouched), retrieves top-k, joins doc metadata, adds snippets.
  /results?query=...          the SAME search rendered as the
                              reference's results.html page (HTML:
                              count+time line, correction banner,
                              per-result cards with the
                              urlparse-netloc Publisher display);
                              also /search?...&format=html.
  /suggest?prefix=sc&k=10     vocabulary autocomplete (cf-ranked).
  /facets?q=...&col=lang[&top_n=..]   facet counts over the match set.
  /reload                     swap to the store's live version (no-op
                              when unchanged or serving a plain --index).
  /healthz                    index + pool + version stats.
"""
from __future__ import annotations

import json
import os
import threading
import time
from typing import Any

import numpy as np

from rayindex.config import AnalyzerConfig, SearchConfig


class _Engine:
    """One immutable bundle of per-index state.  Requests grab the
    app's engine reference ONCE at entry, so a concurrent hot-swap can
    never mix two versions inside one request."""

    def __init__(self, index_dir: str, num_actors: int,
                 spellcheck: bool, version: int | None = None):
        from rayindex.searcher import IndexReader, ShardedSearchPool
        from rayindex.spell import SpellChecker

        self.index_dir = index_dir
        self.version = version
        if num_actors > 0:
            self.provider: Any = ShardedSearchPool(index_dir,
                                                   num_actors=num_actors)
            # spell dict + snippets need a local reader's vocabulary and
            # positional fetch; dict-only state, shards stay mmap'd
            self.reader = IndexReader(index_dir)
        else:
            self.provider = IndexReader(index_dir)
            self.reader = self.provider
        self.spell = (SpellChecker.from_index(self.reader)
                      if spellcheck else None)


class SearchApp:
    """App-startup state + per-request handlers (reference views.py
    flow).  Thread-safe for reads: IndexReader lookups are mmap reads
    plus an LRU (GIL-guarded dict ops); the pool scatters to actors.
    ``store`` serves a snapshot store's live version with ``reload()``
    hot-swap; ``index_dir`` pins one index (reload is then a no-op)."""

    def __init__(self, index_dir: str | None = None, num_actors: int = 0,
                 analyzer: AnalyzerConfig | None = None,
                 search_cfg: SearchConfig | None = None,
                 spellcheck: bool = True, store: str | None = None):
        if (index_dir is None) == (store is None):
            raise ValueError("pass exactly one of index_dir / store")
        self.store = store
        self.analyzer = analyzer or AnalyzerConfig()
        self.search_cfg = search_cfg or SearchConfig(algorithm="auto")
        self._num_actors = num_actors
        self._spellcheck = spellcheck
        self._reload_lock = threading.Lock()
        if store is not None:
            from rayindex.snapshot import current_dir, current_version

            self._eng = _Engine(current_dir(store), num_actors, spellcheck,
                                version=current_version(store))
        else:
            self._eng = _Engine(index_dir, num_actors, spellcheck)
        self.n_requests = 0

    @property
    def index_dir(self) -> str:
        return self._eng.index_dir

    @property
    def provider(self):
        return self._eng.provider

    @property
    def _reader(self):
        return self._eng.reader

    def reload(self) -> dict:
        """Swap to the store's live version if it changed.  Safe under
        concurrent requests: the new engine is fully constructed before
        the single reference assignment; old in-flight requests finish
        on the engine they grabbed at entry."""
        if self.store is None:
            return {"reloaded": False, "reason": "serving a fixed --index"}
        from rayindex.snapshot import current_dir, current_version

        with self._reload_lock:  # one swap at a time; reads never block
            old = self._eng.version
            new = current_version(self.store)
            if new == old:
                return {"reloaded": False, "version": old}
            eng = _Engine(current_dir(self.store), self._num_actors,
                          self._spellcheck, version=new)
            self._eng = eng
            return {"reloaded": True, "from_version": old, "version": new}

    # -- handlers (framework-free: dict in, dict out) -------------------

    def search(self, q: str, k: int = 10, lang: str | None = None,
               scorer: str | None = None, algorithm: str | None = None,
               spellcheck: bool = True, snippets: bool = True) -> dict:
        """The reference request flow: spellcheck (plain queries only) →
        classify+retrieve → metadata join → snippets."""
        from rayindex.query import TermsQuery, parse_query
        from rayindex.scoring import query_terms
        from rayindex.searcher import fetch_doc_metadata
        from rayindex.snippet import doc_snippets

        t0 = time.perf_counter()
        self.n_requests += 1
        eng = self._eng  # one grab: hot-swap-safe for the whole request
        query = q
        corrected = False
        if (eng.spell is not None and spellcheck
                and isinstance(parse_query(q, self.analyzer), TermsQuery)):
            query, corrected = eng.spell.correct_query(q)
        cfg = self.search_cfg
        if algorithm and algorithm != cfg.algorithm:
            import dataclasses

            cfg = dataclasses.replace(cfg, algorithm=algorithm)
        res = eng.provider.search(query, k=k, search_cfg=cfg,
                                  analyzer=self.analyzer, scorer=scorer,
                                  lang=lang)
        rows = [{"rank": i + 1, "doc_id": int(d), "score": float(s)}
                for i, (d, s) in enumerate(res)]
        if rows:
            ids = [r["doc_id"] for r in rows]
            meta = fetch_doc_metadata(eng.index_dir, ids).to_pylist()
            by_id = {m["doc_id"]: m for m in meta}
            snips: dict[int, str] = {}
            if snippets:
                parsed = parse_query(query, self.analyzer)
                snips = doc_snippets(
                    eng.index_dir, eng.reader,
                    sorted(set(query_terms(parsed))),
                    np.asarray(ids, np.int64))
            for r in rows:
                m = by_id.get(r["doc_id"], {})
                r.update({"repo": m.get("repo"), "path": m.get("path"),
                          "commit": m.get("commit"), "lang": m.get("lang")})
                if snippets:
                    r["snippet"] = snips.get(r["doc_id"], "")
        return {
            "query": q,
            "ran_query": query,
            "corrected": corrected,
            "k": k,
            "n_results": len(rows),
            "results": rows,
            "took_ms": round((time.perf_counter() - t0) * 1000, 3),
        }

    def suggest(self, prefix: str, k: int = 10) -> dict:
        from rayindex.spell import suggest_terms

        t = suggest_terms(self._eng.index_dir, prefix, k=k)
        return {"prefix": prefix, "suggestions": t.to_pylist()}

    def facets(self, q: str, col: str = "lang",
               top_n: int | None = None) -> dict:
        from rayindex.facet import facet_counts

        t = facet_counts(self._eng.index_dir, q, col, analyzer=self.analyzer,
                         top_n=top_n)
        return {"query": q, "col": col, "counts": t.to_pylist()}

    def healthz(self) -> dict:
        eng = self._eng
        stats = eng.reader.stats
        return {
            "ok": True,
            "index_dir": eng.index_dir,
            "store": self.store,
            "version": eng.version,
            "n_docs": int(stats.n_docs),
            "total_tokens": int(stats.total_tokens),
            "n_terms": int(eng.reader.n_terms),
            "n_requests": self.n_requests,
            "pool_actors": (len(eng.provider.actors)
                            if hasattr(eng.provider, "actors") else 0),
            "spellcheck": eng.spell is not None,
        }


def render_results_html(payload: dict) -> str:
    """HTML results page mirroring the reference's results.html
    (templates/retrieval/results.html + views.py:72-97): a search form,
    the "Retrieved N … (T seconds)" line, the spell-correction banner
    with a "Search instead for" link to the uncorrected query, one card
    per result — title, a Publisher-style display host computed with
    ``urlparse(url).netloc`` exactly like the reference view, secondary
    metadata lines, a source link — and the empty-results message.
    Framework-free string templating (html.escape everywhere user or
    corpus data lands); the JSON handlers stay the primary API, this is
    the human surface (``/results?query=…`` or ``/search?format=html``)."""
    import html
    from urllib.parse import quote_plus, urlparse

    e = html.escape
    rows = payload.get("results", [])
    out = [
        "<!doctype html><html><head><meta charset='utf-8'>",
        "<title>Search</title></head><body>",
        "<form action='/results' method='GET'>",
        "<input type='text' name='query' "
        "placeholder='Type another query here' required> ",
        "<button type='submit'>Search Results</button></form>",
        f"<p>Retrieved {payload.get('n_results', 0)} documents "
        f"({payload.get('took_ms', 0) / 1000.0} seconds)</p>",
    ]
    if payload.get("corrected"):
        orig = payload.get("query", "")
        out.append(
            f"<p>Showing results for: {e(payload.get('ran_query', ''))}"
            f"</p>Search instead for: <a href='/results?query="
            f"{quote_plus(orig)}&spellcheck=0'>{e(orig)}</a>")
    for r in rows:
        repo = r.get("repo") or ""
        path = r.get("path") or ""
        commit = r.get("commit") or ""
        url = f"https://github.com/{repo}/blob/{commit}/{path}"
        netloc = urlparse(url).netloc  # the reference's publisher display
        out.append(
            "<ul><li><div class='card'>"
            f"<h5>{e(repo)}/{e(path)}</h5>"
            f"<p>Publisher: {e(netloc)}</p>"
            f"<p>Commit: {e(commit)}</p>"
            f"<p>Language: {e(r.get('lang') or '')}</p>"
            + (f"<p>{e(r['snippet'])}</p>" if r.get("snippet") else "")
            + f"<div><a href='{e(url)}'>Go to source</a></div>"
            "</div></li></ul>")
    if not rows:
        out.append("<p>The provided query did not return any results. "
                   "Please try another query.</p>")
    out.append("</body></html>")
    return "".join(out)


def start_reload_poller(app: SearchApp, interval_s: float) -> threading.Event:
    """Background store poll: every ``interval_s`` call ``app.reload()``
    (a no-op while the pointer is unchanged — one tiny CURRENT read).
    Returns a stop Event; the thread is a daemon either way."""
    stop = threading.Event()

    def loop() -> None:
        while not stop.wait(interval_s):
            try:
                app.reload()
            except Exception:  # keep polling: a torn publish heals itself
                pass

    threading.Thread(target=loop, daemon=True,
                     name="rayindex-reload-poller").start()
    return stop


def make_server(app: SearchApp, host: str = "127.0.0.1", port: int = 8080):
    """Bind ``app`` behind a stdlib threading HTTP server (transport
    only; returns the server — call ``serve_forever()`` to run)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_html(self, code: int, html_body: str) -> None:
            body = html_body.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API name)
            u = urlparse(self.path)
            qs = {key: v[0] for key, v in parse_qs(u.query).items()}
            try:
                if u.path in ("/search", "/results"):
                    # /results takes the reference's ?query= param and
                    # renders HTML; /search stays the JSON API (or HTML
                    # with &format=html)
                    qkey = "query" if u.path == "/results" else "q"
                    if qkey not in qs:
                        return self._send(400, {"error": f"missing {qkey}"})
                    payload = app.search(
                        qs[qkey], k=int(qs.get("k", "10")),
                        lang=qs.get("lang"), scorer=qs.get("scorer"),
                        algorithm=qs.get("algorithm"),
                        spellcheck=qs.get("spellcheck", "1") != "0",
                        snippets=qs.get("snippets", "1") != "0")
                    if u.path == "/results" or \
                            qs.get("format") == "html":
                        return self._send_html(
                            200, render_results_html(payload))
                    return self._send(200, payload)
                if u.path == "/suggest":
                    if "prefix" not in qs:
                        return self._send(400, {"error": "missing prefix"})
                    return self._send(200, app.suggest(
                        qs["prefix"], k=int(qs.get("k", "10"))))
                if u.path == "/facets":
                    if "q" not in qs:
                        return self._send(400, {"error": "missing q"})
                    top_n = qs.get("top_n")
                    return self._send(200, app.facets(
                        qs["q"], col=qs.get("col", "lang"),
                        top_n=int(top_n) if top_n else None))
                if u.path == "/reload":
                    return self._send(200, app.reload())
                if u.path == "/healthz":
                    return self._send(200, app.healthz())
                return self._send(404, {"error": f"no route {u.path}"})
            except ValueError as e:
                return self._send(400, {"error": str(e)})
            except Exception as e:  # surface, don't kill the server
                return self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main_serve(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="rayindex.serve",
        description="Serve a built index over HTTP (JSON): /search "
                    "/suggest /facets /reload /healthz.  Spellcheck is ON "
                    "by default for plain queries (reference parity).")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--index", help="serve one fixed index dir")
    g.add_argument("--store", help="serve the live version of a snapshot "
                                   "store (rayindex.snapshot); /reload "
                                   "hot-swaps to a newly published version")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--actors", type=int, default=0,
                   help="serve through a ShardedSearchPool of N Ray "
                        "actors (0 = in-process IndexReader)")
    p.add_argument("--analyzer", choices=["reference", "ascii", "code"],
                   default="reference")
    p.add_argument("--scorer", default="bm25")
    p.add_argument("--algorithm", default="auto",
                   choices=["auto", "taat", "bmw"])
    p.add_argument("--no-spellcheck", action="store_true")
    p.add_argument("--reload-interval", type=float, default=0.0,
                   help="with --store: poll the store every N seconds and "
                        "hot-swap when a new version is published "
                        "(0 = manual /reload only)")
    args = p.parse_args(argv)

    if args.actors > 0:
        import ray

        if not ray.is_initialized():
            ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                     include_dashboard=False, logging_level="ERROR")
    app = SearchApp(args.index, num_actors=args.actors,
                    analyzer=AnalyzerConfig(mode=args.analyzer),
                    search_cfg=SearchConfig(scorer=args.scorer,
                                            algorithm=args.algorithm),
                    spellcheck=not args.no_spellcheck,
                    store=args.store)
    srv = make_server(app, args.host, args.port)
    if args.reload_interval > 0 and args.store:
        start_reload_poller(app, args.reload_interval)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      **app.healthz()}))
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
    return 0


if __name__ == "__main__":  # pragma: no cover — long-lived server entry
    import sys

    sys.exit(main_serve())
