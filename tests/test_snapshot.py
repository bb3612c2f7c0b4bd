"""Snapshot store (rayindex/snapshot.py): atomic publish / rollback /
prune invariants, torn-publish reclamation, and SearchApp hot-swap —
queries served during a version flip must come from exactly one
version, and the flipped app must be rank-identical to a fresh reader
over the new version."""

from __future__ import annotations

import json
import os
import threading

import pyarrow.parquet as pq
import pytest


def _build(base, n_files, tag):
    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    tbl = corpus.make_rows(corpus.file_plan(n_files, 4))
    src = base / f"src_{tag}"
    src.mkdir()
    pq.write_table(tbl, str(src / "docs.parquet"))
    out = str(base / f"ix_{tag}")
    build_index(str(src), out, BuildConfig(num_shards=4,
                                           tokenize_batch_size=16))
    return out


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("snap")
    return base, _build(base, 30, "a"), _build(base, 60, "b")


def test_publish_flip_rollback_prune(two_indexes, tmp_path):
    from rayindex import snapshot as sn

    base, ix_a, ix_b = two_indexes
    store = str(tmp_path / "store")

    assert sn.current_version(store) is None
    with pytest.raises(FileNotFoundError):
        sn.current_dir(store)

    v1 = sn.publish(store, ix_a, note="first")
    assert v1 == 1
    assert sn.current_version(store) == 1
    assert sn.current_dir(store).endswith("v000001")
    # staging hard-links: source untouched, store version complete
    assert os.path.exists(os.path.join(ix_a, "stats",
                                       "collection_stats.parquet"))
    assert sn._is_index_dir(sn.current_dir(store))

    v2 = sn.publish(store, ix_b, note="second")
    assert (v2, sn.current_version(store)) == (2, 2)

    sn.rollback(store, 1)
    assert sn.current_version(store) == 1
    with pytest.raises(ValueError):
        sn.rollback(store, 99)

    # publish after rollback takes a FRESH number (v2 stays immutable)
    v3 = sn.publish(store, ix_a, note="post-rollback")
    assert (v3, sn.current_version(store)) == (3, 3)

    # prune keeps the newest `keep` and never touches CURRENT
    sn.rollback(store, 1)
    removed = sn.prune(store, keep=1)
    assert removed == [2]  # v3 is newest (kept), v1 is current (kept)
    assert {v["version"] for v in sn.versions(store)} == {1, 3}

    # audit trail records every flip in order
    hist = [json.loads(ln) for ln in
            open(os.path.join(store, "HISTORY.jsonl"))]
    assert [h["op"] for h in hist] == [
        "publish", "publish", "rollback", "publish", "rollback"]


def test_torn_publish_invisible_and_reclaimed(two_indexes, tmp_path):
    from rayindex import snapshot as sn

    base, ix_a, ix_b = two_indexes
    store = str(tmp_path / "store")
    sn.publish(store, ix_a)
    # simulate a crash between staging and pointer flip
    torn = os.path.join(store, "v000002")
    os.makedirs(os.path.join(torn, "shards"))
    assert sn.current_version(store) == 1  # reader never sees it
    recs = {v["version"]: v for v in sn.versions(store)}
    assert recs[2]["orphan"] and not recs[1]["orphan"]
    # next publish reclaims the orphan number and completes it
    v = sn.publish(store, ix_b)
    assert v == 2
    assert sn._is_index_dir(sn.current_dir(store))


def test_publish_rejects_incomplete_dir(tmp_path):
    from rayindex import snapshot as sn

    bogus = tmp_path / "not_an_index"
    bogus.mkdir()
    with pytest.raises(ValueError, match="not a complete index"):
        sn.publish(str(tmp_path / "store"), str(bogus))


def test_serve_hot_swap(two_indexes, tmp_path):
    """SearchApp(store=...) serves v1; publish v2 + reload() swaps the
    engine; results become rank-identical to a fresh reader over v2;
    concurrent searches during the swap all succeed on one version."""
    from rayindex import snapshot as sn
    from rayindex.searcher import IndexReader
    from rayindex.serve import SearchApp

    base, ix_a, ix_b = two_indexes
    store = str(tmp_path / "store")
    sn.publish(store, ix_a)

    app = SearchApp(store=store)
    assert app.healthz()["version"] == 1
    n_docs_v1 = app.healthz()["n_docs"]

    term = next(t for t, cf in app._reader.iter_terms()
                if cf >= 5 and t.isalpha() and len(t) >= 4)
    r1 = app.search(term, k=5, spellcheck=False, snippets=False)

    # no new version yet: reload is a no-op
    assert app.reload() == {"reloaded": False, "version": 1}

    sn.publish(store, ix_b)
    # swap under concurrent load: every in-flight search must succeed
    # and carry a consistent result set from exactly one version
    errs: list[Exception] = []

    def hammer():
        try:
            for _ in range(25):
                out = app.search(term, k=5, spellcheck=False,
                                 snippets=False)
                assert out["n_results"] >= 0
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(3)]
    for t in threads:
        t.start()
    rep = app.reload()
    for t in threads:
        t.join()
    assert not errs
    assert rep == {"reloaded": True, "from_version": 1, "version": 2}

    hz = app.healthz()
    assert hz["version"] == 2 and hz["n_docs"] > n_docs_v1
    r2 = app.search(term, k=5, spellcheck=False, snippets=False)
    want = IndexReader(sn.current_dir(store)).search(
        term, k=5, search_cfg=app.search_cfg, analyzer=app.analyzer)
    assert [r["doc_id"] for r in r2["results"]] == [int(d) for d, _ in want]
    # v2 indexes a superset corpus: the hit set genuinely changed
    assert r1["results"] != r2["results"]

    # rollback + reload returns to v1 results exactly
    sn.rollback(store, 1)
    assert app.reload()["version"] == 1
    r3 = app.search(term, k=5, spellcheck=False, snippets=False)
    assert [r["doc_id"] for r in r3["results"]] == \
        [r["doc_id"] for r in r1["results"]]


def test_fixed_index_app_reload_noop(two_indexes):
    from rayindex.serve import SearchApp

    base, ix_a, _ = two_indexes
    app = SearchApp(ix_a)
    assert app.reload()["reloaded"] is False
    with pytest.raises(ValueError):
        SearchApp()
    with pytest.raises(ValueError):
        SearchApp(ix_a, store="x")


def test_snapshot_cli_round_trip(two_indexes, tmp_path, capsys):
    from rayindex.cli import main_snapshot

    base, ix_a, ix_b = two_indexes
    store = str(tmp_path / "store")

    assert main_snapshot(["publish", "--store", store, "--index", ix_a,
                          "--note", "cli v1"]) == 0
    assert main_snapshot(["publish", "--store", store, "--index", ix_b]) == 0
    assert main_snapshot(["rollback", "--store", store,
                          "--version", "1"]) == 0
    assert main_snapshot(["list", "--store", store]) == 0
    out = [json.loads(ln) for ln in
           capsys.readouterr().out.strip().splitlines()]
    assert out[0] == {"published": 1, "current": 1}
    assert out[1] == {"published": 2, "current": 2}
    assert out[2] == {"current": 1}
    assert out[3]["current"] == 1
    assert [v["version"] for v in out[3]["versions"]] == [1, 2]


def test_full_lifecycle_build_publish_upsert_consolidate_reload(
        ray_session, tmp_path):
    """The production loop end to end: build v1 → publish → serve →
    upsert a changed corpus → consolidate → publish v2 → /reload swaps
    to it (queries now see the updated docs) → rollback restores v1
    results exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayindex import corpus
    from rayindex import snapshot as sn
    from rayindex.build import build_index
    from rayindex.config import BuildConfig
    from rayindex.serve import SearchApp
    from rayindex.upsert import consolidate_upsert, upsert_index

    def _src(name, t):
        d = tmp_path / f"src_{name}"
        d.mkdir()
        pq.write_table(t, str(d / "docs.parquet"))
        return str(d)

    cfg = BuildConfig(num_shards=4, tokenize_batch_size=16)
    tbl = corpus.make_rows(corpus.file_plan(40, 4))
    v1 = str(tmp_path / "v1")
    build_index(_src("v1", tbl), v1, cfg)

    store = str(tmp_path / "store")
    sn.publish(store, v1, note="initial build")
    app = SearchApp(store=store)

    marker = "zzlifecycle"
    assert app.search(marker, snippets=False,
                      spellcheck=False)["n_results"] == 0

    # upsert: rewrite 5 docs to contain the marker term
    rows = tbl.to_pylist()
    updates = []
    for r in rows[::8][:5]:
        r = dict(r)
        r["content"] = r["content"] + f"\n{marker} content body"
        updates.append(r)
    upd = pa.Table.from_pylist(updates, schema=tbl.schema)
    fed = str(tmp_path / "fed")
    upsert_index(v1, fed, _src("upd", upd), cfg)
    final = str(tmp_path / "final")
    consolidate_upsert(fed, final, cfg)

    v2 = sn.publish(store, final, note="post-upsert consolidation")
    rep = app.reload()
    assert rep == {"reloaded": True, "from_version": 1, "version": v2}
    hits = app.search(marker, k=10, snippets=False, spellcheck=False)
    assert hits["n_results"] == 5  # exactly the five rewritten docs

    sn.rollback(store, 1)
    app.reload()
    assert app.search(marker, snippets=False,
                      spellcheck=False)["n_results"] == 0


def test_publish_rejects_federation_dir(two_indexes, tmp_path):
    import json as _json

    from rayindex import snapshot as sn

    fed = tmp_path / "fed"
    fed.mkdir()
    (fed / "federation.json").write_text(_json.dumps({"subs": ["sub_000"]}))
    with pytest.raises(ValueError, match="consolidate_upsert"):
        sn.publish(str(tmp_path / "store"), str(fed))


def test_pool_backed_store_hot_swap(two_indexes, tmp_path):
    """store + --actors shape: the swapped-in engine builds a fresh
    ShardedSearchPool; results after reload are rank-identical to a
    fresh reader over the new version, and the old pool's actors are
    released with the old engine (plain handles, GC-reaped)."""
    from rayindex import snapshot as sn
    from rayindex.searcher import IndexReader
    from rayindex.serve import SearchApp

    base, ix_a, ix_b = two_indexes
    store = str(tmp_path / "store")
    sn.publish(store, ix_a)
    app = SearchApp(store=store, num_actors=2)
    assert app.healthz()["pool_actors"] == 2
    term = next(t for t, cf in app._reader.iter_terms()
                if cf >= 5 and t.isalpha() and len(t) >= 4)
    app.search(term, k=5, spellcheck=False, snippets=False)

    sn.publish(store, ix_b)
    assert app.reload()["version"] == 2
    got = app.search(term, k=5, spellcheck=False, snippets=False)
    want = IndexReader(sn.current_dir(store)).search(
        term, k=5, search_cfg=app.search_cfg, analyzer=app.analyzer)
    assert [r["doc_id"] for r in got["results"]] == \
        [int(d) for d, _ in want]
    assert app.healthz()["version"] == 2


def test_reload_poller_auto_swaps(two_indexes, tmp_path):
    import time

    from rayindex import snapshot as sn
    from rayindex.serve import SearchApp, start_reload_poller

    base, ix_a, ix_b = two_indexes
    store = str(tmp_path / "store")
    sn.publish(store, ix_a)
    app = SearchApp(store=store)
    stop = start_reload_poller(app, 0.1)
    try:
        assert app.healthz()["version"] == 1
        sn.publish(store, ix_b)
        deadline = time.time() + 10
        while app.healthz()["version"] != 2:
            assert time.time() < deadline, "poller never swapped"
            time.sleep(0.05)
    finally:
        stop.set()
