"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline (index build + actor-pool BM25 search) on
/root/testdata/sf0.001.  ``queries()`` — one callable per implemented
operator family (SURVEY.md §2 + datapipe extras), each over ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry
(identical column names; floats rounded to 6 decimals on both sides).

Ray is initialised by the driver BEFORE import: nothing here (or in the
rayindex library) calls ray.init/shutdown.

The index-backed entries use the ``ascii`` analyzer mode (tokens ==
``regexp_extract_all(lower(text), '[a-z0-9_]+')``) so the whole build →
shuffle → compress → mmap → score path is checkable against pure SQL.
Engine-internal doc_ids are translated back to the source table's
``doc_id`` at the output boundary.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# fixed probe terms present in the driver's synthetic documents vocabulary
PROBE_TERMS = ("scan", "spark", "customer", "window")
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "scan"),
    (1, "merge window"),
    (2, "spark customer batch"),
    (3, "zzznosuchterm"),
    (4, "group stream table"),
]
TOKEN_RE_SQL = "'[a-z0-9_]+'"

_INDEX_CACHE: dict[str, Any] = {}


def _micro_rank(rows: dict, k: int) -> pa.Table:
    """Build a (query_id, rank, doc_id, score_micro) table where rank is
    computed on the ROUNDED score — the unrounded doubles differ between
    engines in their last bits, so ties must be broken in micro space on
    both sides (the SQL oracles rank the same way)."""
    import pandas as pd

    df = pd.DataFrame(rows)
    df = df.sort_values(["query_id", "score_micro", "doc_id"],
                        ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k]
    return pa.table({
        "query_id": pa.array(df["query_id"].to_numpy(np.int64)),
        "rank": pa.array(df["rank"].to_numpy(np.int32)),
        "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
        "score_micro": pa.array(df["score_micro"].to_numpy(np.int64)),
    })


def _micro_cols(t: pa.Table, cols: tuple[str, ...]) -> pa.Table:
    """Replace float columns with integer micro-units (round(x*1e6)) so the
    driver's value-hash compares exactly — pyarrow round() and DuckDB
    round() produce different doubles for the same value, so floats can't
    be hashed across engines.  Rounding rule must be DuckDB's
    HALF-AWAY-FROM-ZERO (std::round), NOT numpy's half-to-even rint:
    exact .5 micro boundaries occur in real data (e.g. a top-2gram
    fraction of 45/640 = 0.0703125 → 70312.5) and rint sends them the
    other way."""
    for c in cols:
        idx = t.column_names.index(c)
        x = t[c].to_numpy(zero_copy_only=False).astype(np.float64) * 1e6
        vals = np.copysign(np.floor(np.abs(x) + 0.5), x)
        t = t.set_column(idx, c + "_micro", pa.array(vals.astype(np.int64), pa.int64()))
    return t


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def _read_parquet(paths, **kwargs):
    """read_parquet with pandas schema metadata stripped (rayindex.io) so
    Ray Data's block-schema hash dedup works instead of warning + O(blocks)
    unify_schemas on every stage."""
    from rayindex.io import read_parquet_clean

    return read_parquet_clean(paths, **kwargs)


def _ascii_cfgs():
    from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig

    analyzer = AnalyzerConfig(mode="ascii")
    build = BuildConfig(analyzer=analyzer, num_shards=8, tokenize_batch_size=512)
    search = SearchConfig(scorer="bm25", algorithm="bmw")
    return analyzer, build, search


def _ensure_index(sf_dir: str):
    """Build (or resume from checkpoints) the ascii-mode index for sf_dir;
    returns (index_dir, engine_doc_id -> source doc_id array)."""
    if sf_dir in _INDEX_CACHE:
        return _INDEX_CACHE[sf_dir]
    import ray.data

    from rayindex.engine import adapt_documents, build_index

    analyzer, build_cfg, _ = _ascii_cfgs()
    out = os.path.join(
        "/tmp/rayindex_entry",
        os.path.basename(os.path.normpath(sf_dir)) + "_" + build_cfg.fingerprint(),
    )
    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text", "lang", "source"])
    ds = adapt_documents(ds, repo_col="source", path_col="doc_id",
                         lang_col="lang", content_col="text")
    build_index(ds, out, build_cfg, input_token=f"testdata:{_docs_path(sf_dir)}")
    store = pq.read_table(os.path.join(out, "doc_store"), columns=["doc_id", "path"])
    eng = store["doc_id"].to_numpy()
    orig = np.asarray([int(p) for p in store["path"].to_pylist()], np.int64)
    id_map = np.zeros(int(eng.max()) + 1, np.int64)
    id_map[eng] = orig
    _INDEX_CACHE[sf_dir] = (out, id_map)
    return _INDEX_CACHE[sf_dir]


def entry() -> Any:
    """Flagship: build the full index over sf0.001 and run a mixed query set
    through the searcher actor pool; returns the results Dataset."""
    import ray.data

    from rayindex.searcher import search_dataset

    sf_dir = "/root/testdata/sf0.001"
    analyzer, _, search_cfg = _ascii_cfgs()
    index_dir, _ = _ensure_index(sf_dir)
    qs = pa.table({
        "query_id": pa.array(range(6), pa.int64()),
        "query": pa.array([
            "scan", "merge window", '"table scan"',
            "scan AND customer", "#3(spark,customer)", "group stream table",
        ]),
        "k": pa.array([10] * 6, pa.int32()),
    })
    return search_dataset(qs, index_dir, search_cfg=search_cfg,
                          analyzer=analyzer, concurrency=2)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_term_stats(sf_dir: str) -> pa.Table:
    import glob

    index_dir, _ = _ensure_index(sf_dir)
    parts = [
        pq.read_table(f, columns=["term", "df", "cf"])
        for f in sorted(glob.glob(os.path.join(index_dir, "shards", "*.dict.parquet")))
    ]
    return pa.concat_tables(parts)


def _q_snapshot_term_stats(sf_dir: str) -> pa.Table:
    """Index lifecycle: publish the built index into a versioned
    snapshot store (atomic CURRENT pointer flip, rayindex/snapshot.py),
    publish a second version, roll back to v1, and read term stats off
    ``current_dir`` — the store round-trip (hard-link staging + two
    pointer flips) must serve exactly the index that was published.
    Oracle: the term_stats SQL (the reference serves whatever index its
    deploy copied into place, apps.py; the store makes that swap atomic
    and reversible)."""
    import glob

    from rayindex import snapshot as _sn

    index_dir, _ = _ensure_index(sf_dir)
    store = os.path.join(
        "/tmp/rayindex_entry",
        os.path.basename(os.path.normpath(sf_dir)) + "_store_"
        + _ascii_cfgs()[1].fingerprint())
    if _sn.current_version(store) != 1:
        _sn.publish(store, index_dir, note="v1")
        _sn.publish(store, index_dir, note="v2 (identical payload)")
        _sn.rollback(store, 1)
    live = _sn.current_dir(store)
    parts = [
        pq.read_table(f, columns=["term", "df", "cf"])
        for f in sorted(glob.glob(os.path.join(live, "shards",
                                               "*.dict.parquet")))
    ]
    return pa.concat_tables(parts)


def _q_merged_term_stats(sf_dir: str) -> pa.Table:
    """Incremental ingest: build TWO half-corpus indexes independently,
    fold them with merge_indexes (decode-free shard splice + doc-id
    rebase; reference parity for its standalone two-index merge tool,
    /root/reference/indexing/index_merging/index_merging.py), and read
    term stats off the MERGED index.  Oracle: the term_stats SQL over the
    full corpus — merge(build(A), build(B)) must carry exactly the full
    corpus's vocabulary, df and cf."""
    import glob

    import ray.data

    from rayindex.engine import adapt_documents, build_index
    from rayindex.merge import merge_indexes

    _, build_cfg, _ = _ascii_cfgs()
    base = os.path.join(
        "/tmp/rayindex_entry",
        os.path.basename(os.path.normpath(sf_dir)) + "_merge_"
        + build_cfg.fingerprint())
    merged = os.path.join(base, "merged")
    if not os.path.exists(os.path.join(merged, "stats",
                                       "collection_stats.parquet")):
        full = pq.read_table(_docs_path(sf_dir),
                             columns=["doc_id", "text", "lang", "source"])
        mid = full.num_rows // 2
        halves = {"a": full.slice(0, mid), "b": full.slice(mid)}
        for name, tbl in halves.items():
            ds = adapt_documents(ray.data.from_arrow(tbl), repo_col="source",
                                 path_col="doc_id", lang_col="lang",
                                 content_col="text")
            build_index(ds, os.path.join(base, name), build_cfg,
                        input_token=f"testdata:{_docs_path(sf_dir)}#{name}")
        merge_indexes(os.path.join(base, "a"), os.path.join(base, "b"),
                      merged)
    parts = [
        pq.read_table(f, columns=["term", "df", "cf"])
        for f in sorted(glob.glob(os.path.join(merged, "shards",
                                               "*.dict.parquet")))
    ]
    return pa.concat_tables(parts)


def _q_deleted_term_stats(sf_dir: str) -> pa.Table:
    """Index-lifecycle delete: remove every lang='de' doc (metadata filter
    path) plus every source doc_id % 97 == 0 doc (explicit-id path) from
    the built index via rayindex.delete.delete_docs — untouched fine
    blocks byte-splice, hit blocks re-encode — then read term stats off
    the SURVIVING index.  Oracle: term-stats SQL over documents WHERE NOT
    deleted."""
    import glob

    import pyarrow.dataset as pads

    from rayindex.delete import delete_docs

    index_dir, _ = _ensure_index(sf_dir)
    out = index_dir + "_deleted"
    if not os.path.exists(os.path.join(out, "stats",
                                       "collection_stats.parquet")):
        src_ids = pq.read_table(_docs_path(sf_dir),
                                columns=["doc_id"])["doc_id"].to_numpy()
        # adapt_documents zero-pads numeric path keys to width 12
        mod_paths = [f"{int(i):012d}" for i in src_ids if int(i) % 97 == 0]
        expr = (pads.field("lang") == "de") | pads.field("path").isin(mod_paths)
        delete_docs(index_dir, out, filter_expr=expr)
    parts = [
        pq.read_table(f, columns=["term", "df", "cf"])
        for f in sorted(glob.glob(os.path.join(out, "shards",
                                               "*.dict.parquet")))
    ]
    return pa.concat_tables(parts)


def _q_compacted_postings_probe(sf_dir: str) -> pa.Table:
    """Full index lifecycle: delete docs (lang='de' ∪ doc_id%97==0) then
    COMPACT — dense doc-id renumber + canonical shard rewrite through the
    build's own fine-block machinery (rayindex/compact.py; byte-identical
    to a fresh build of the filtered corpus, pytest-gated).  Probes
    posting positions off the compacted index.  Oracle: the
    postings_probe SQL over documents WHERE NOT deleted."""
    from rayindex.compact import compact_index
    from rayindex.searcher import IndexReader

    _q_deleted_term_stats(sf_dir)  # ensures the deleted index exists
    index_dir, _ = _ensure_index(sf_dir)
    out = index_dir + "_compacted"
    if not os.path.exists(os.path.join(out, "stats",
                                       "collection_stats.parquet")):
        _, build_cfg, _ = _ascii_cfgs()
        compact_index(index_dir + "_deleted", out, build_cfg)
    store = pq.read_table(os.path.join(out, "doc_store"),
                          columns=["doc_id", "path"])
    eng = store["doc_id"].to_numpy()
    orig = np.asarray([int(p) for p in store["path"].to_pylist()], np.int64)
    id_map = np.zeros(int(eng.max()) + 1, np.int64)
    id_map[eng] = orig
    r = IndexReader(out)
    terms, docs, tfs, minp, maxp = [], [], [], [], []
    for term in PROBE_TERMS:
        p = r.lookup(term, need_positions=True)
        if p is None:
            continue
        starts = p.pos_slices()
        for i in range(p.df):
            terms.append(term)
            docs.append(int(id_map[p.docs[i]]))
            tfs.append(int(p.tfs[i]))
            seg = p.positions[int(starts[i]):int(starts[i]) + int(p.tfs[i])]
            minp.append(int(seg.min()))
            maxp.append(int(seg.max()))
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "tf": pa.array(tfs, pa.int64()),
        "min_pos": pa.array(minp, pa.int64()),
        "max_pos": pa.array(maxp, pa.int64()),
    })


def _ensure_tombstoned(sf_dir: str):
    """Tombstone every source doc_id % 13 == 5 doc (O(n_deleted) takedown
    path, rayindex/delete.py:tombstone_docs — artifacts hard-link, only
    stats/tombstones.bin is written; searchers mask the docs at decode
    time with PRE-delete statistics, Lucene liveDocs semantics)."""
    from rayindex.delete import tombstone_docs

    index_dir, id_map = _ensure_index(sf_dir)
    out = index_dir + "_tombstoned"
    if not os.path.exists(os.path.join(out, "stats", "tombstones.bin")):
        store = pq.read_table(os.path.join(index_dir, "doc_store"),
                              columns=["doc_id", "path"])
        eng = store["doc_id"].to_numpy()
        orig = np.asarray([int(p) for p in store["path"].to_pylist()],
                          np.int64)
        tombstone_docs(index_dir, out, doc_ids=np.sort(eng[orig % 13 == 5]))
    return out, id_map


def _q_tombstone_postings_probe(sf_dir: str) -> pa.Table:
    """Postings probe over a TOMBSTONED index: deleted docs vanish from
    every posting (tf/positions of survivors untouched).  Oracle: the
    postings_probe SQL with the tombstoned docs filtered out."""
    from rayindex.searcher import IndexReader

    out, id_map = _ensure_tombstoned(sf_dir)
    r = IndexReader(out)
    terms, docs, tfs, minp, maxp = [], [], [], [], []
    for term in PROBE_TERMS:
        p = r.lookup(term, need_positions=True)
        if p is None:
            continue
        starts = p.pos_slices()
        for i in range(p.docs.size):
            terms.append(term)
            docs.append(int(id_map[p.docs[i]]))
            tfs.append(int(p.tfs[i]))
            seg = p.positions[int(starts[i]):int(starts[i]) + int(p.tfs[i])]
            minp.append(int(seg.min()))
            maxp.append(int(seg.max()))
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "tf": pa.array(tfs, pa.int64()),
        "min_pos": pa.array(minp, pa.int64()),
        "max_pos": pa.array(maxp, pa.int64()),
    })


def _q_tombstone_bm25_topk(sf_dir: str) -> pa.Table:
    """BM25 top-10 over a TOMBSTONED index: results equal the FULL
    index's ranking with deleted docs filtered out at IDENTICAL scores
    (statistics frozen until compact).  Oracle: the bm25_topk SQL with
    full-corpus stats and the tombstoned docs excluded before ranking."""
    from rayindex.searcher import IndexReader

    analyzer, _, search_cfg = _ascii_cfgs()
    out, id_map = _ensure_tombstoned(sf_dir)
    r = IndexReader(out)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in BM25_QUERIES:
        for doc, score in r.search(qtext, k=18, search_cfg=search_cfg,
                                   analyzer=analyzer):
            rows["query_id"].append(qid)
            rows["doc_id"].append(int(id_map[doc]))
            rows["score_micro"].append(int(np.rint(score * 1e6)))
    return _micro_rank(rows, 10)


def _q_ranker_agreement(sf_dir: str):
    """Results-diff parity (reference compare_results.py): per-query
    agreement between the standard BM25 ranking and the reference
    BM25-variant ranking (F1/F2 scorer) over the same query set —
    same-rank matches plus position-independent overlap, computed
    distributed (groupby(query_id).map_groups, rayindex/evaluate.py).
    Oracle: both scoring formulas and the agreement join in SQL."""
    from rayindex.evaluate import compare_rankings
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    bm = _q_bm25_topk(sf_dir)
    r = IndexReader(index_dir)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in BM25_QUERIES:
        for doc, score in r.search(qtext, k=18, analyzer=analyzer,
                                   scorer="reference"):
            rows["query_id"].append(qid)
            rows["doc_id"].append(int(id_map[doc]))
            rows["score_micro"].append(int(np.rint(score * 1e6)))
    ref = _micro_rank(rows, 10)
    return compare_rankings(bm, ref)


def _q_sequence_pack(sf_dir: str):
    """GPT-style sequence packing: concatenate all docs' token streams in
    id order, cut into 128-token training sequences, report which span of
    which doc lands in which sequence.  Distributed global prefix sum:
    per-range partial sums → O(ranges) driver prefix → broadcast bases →
    per-range vectorized span cut (rayindex/datapipe/pack.py).  Oracle:
    window cumsum + generate_series in SQL."""
    import ray.data

    from rayindex.datapipe.pack import pack_sequences

    ds = _read_parquet(_docs_path(sf_dir),
                               columns=["doc_id", "text"])
    return pack_sequences(ds, 128)


def _q_facet_lang_counts(sf_dir: str) -> pa.Table:
    """Faceted search, serving path: boolean-AND match set → per-lang doc
    counts via a bincount over the mmap'd lang_codes.bin (O(matches), no
    table scan; rayindex/facet.py)."""
    from rayindex.facet import facet_counts

    index_dir, _ = _ensure_index(sf_dir)
    analyzer, _, _ = _ascii_cfgs()
    return facet_counts(index_dir, "scan AND customer", "lang",
                        analyzer=analyzer)


def _q_facet_repo_counts(sf_dir: str) -> pa.Table:
    """Faceted search, generic-column path: the match-id set broadcasts
    via ray.put and one Ray Data pass over doc-store parts emits per-batch
    (value, count) partials combined by a tiny groupby — matching rows
    never leave the object store."""
    from rayindex.facet import facet_counts

    index_dir, _ = _ensure_index(sf_dir)
    analyzer, _, _ = _ascii_cfgs()
    return facet_counts(index_dir, "scan AND customer", "repo",
                        analyzer=analyzer)


def _q_search_snippets(sf_dir: str) -> pa.Table:
    """Result-page snippets: for each BM25 top-10 result, the ±2-token
    window around the first occurrence of any query term — positions from
    the lazy candidate-restricted fetch, content from the top-k broadcast
    semi-join (rayindex/snippet.py).  Oracle: DuckDB list slicing over
    the same token rule."""
    from rayindex.searcher import IndexReader
    from rayindex.snippet import doc_snippets

    index_dir, _ = _ensure_index(sf_dir)
    bm = _q_bm25_topk(sf_dir)
    store = pq.read_table(os.path.join(index_dir, "doc_store"),
                          columns=["doc_id", "path"])
    rev = {int(p): d for d, p in zip(store["doc_id"].to_pylist(),
                                     store["path"].to_pylist())}
    reader = IndexReader(index_dir)
    rows = {"query_id": [], "doc_id": [], "snippet": []}
    for qid, qtext in BM25_QUERIES:
        sel = bm.filter(pc.equal(bm["query_id"], qid))
        src = sel["doc_id"].to_pylist()
        if not src:
            continue
        eng = np.asarray([rev[d] for d in src], np.int64)
        sn = doc_snippets(index_dir, reader, sorted(set(qtext.split())), eng)
        for s_id, e_id in zip(src, eng):
            rows["query_id"].append(qid)
            rows["doc_id"].append(s_id)
            rows["snippet"].append(sn[int(e_id)])
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "snippet": pa.array(rows["snippet"], pa.string()),
    })


def _q_suggest_terms(sf_dir: str) -> pa.Table:
    """Search-box autocomplete: top-10 vocabulary terms with prefix 's',
    by collection frequency (term-asc tie-break) — predicate-pushdown
    range reads of the term-sorted shard dicts, one task per shard, k-way
    driver merge (rayindex/spell.py::suggest_terms)."""
    from rayindex.spell import suggest_terms

    index_dir, _ = _ensure_index(sf_dir)
    return suggest_terms(index_dir, "s", k=10)


def _q_collection_stats(sf_dir: str) -> pa.Table:
    index_dir, _ = _ensure_index(sf_dir)
    t = pq.read_table(os.path.join(index_dir, "stats", "collection_stats.parquet"))
    return _micro_cols(t, ("avg_dl",))


def _q_postings_probe(sf_dir: str) -> pa.Table:
    from rayindex.searcher import IndexReader

    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    terms, docs, tfs, minp, maxp = [], [], [], [], []
    for term in PROBE_TERMS:
        p = r.lookup(term, need_positions=True)
        if p is None:
            continue
        starts = p.pos_slices()
        for i in range(p.df):
            terms.append(term)
            docs.append(int(id_map[p.docs[i]]))
            tfs.append(int(p.tfs[i]))
            seg = p.positions[int(starts[i]) : int(starts[i]) + int(p.tfs[i])]
            minp.append(int(seg.min()))
            maxp.append(int(seg.max()))
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "doc_id": pa.array(docs, pa.int64()),
        "tf": pa.array(tfs, pa.int64()),
        "min_pos": pa.array(minp, pa.int64()),
        "max_pos": pa.array(maxp, pa.int64()),
    })


def _q_bm25_topk(sf_dir: str) -> pa.Table:
    """Standard BM25 (k1=1.2 b=0.75) top-10 via the searcher actor pool +
    block-max WAND; scores rounded to 6 decimals (oracle: same SQL round)."""
    from rayindex.searcher import search_dataset

    analyzer, _, search_cfg = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    qs = pa.table({
        "query_id": pa.array([q[0] for q in BM25_QUERIES], pa.int64()),
        "query": pa.array([q[1] for q in BM25_QUERIES]),
        "k": pa.array([18] * len(BM25_QUERIES), pa.int32()),  # overfetch for micro re-rank
    })
    res = search_dataset(qs, index_dir, search_cfg=search_cfg,
                         analyzer=analyzer, concurrency=2).to_pandas()
    return _micro_rank({
        "query_id": res["query_id"].to_numpy(),
        "doc_id": id_map[res["doc_id"].to_numpy()],
        "score_micro": np.rint(res["score"].to_numpy() * 1e6).astype(np.int64),
    }, 10)


def _q_bm25_topk_lang(sf_dir: str) -> pa.Table:
    """BM25 top-10 with a metadata filter (lang='de') — the engine's
    generalization of the reference date-range filter: candidates are
    intersected with the allowed docs, stats stay collection-global."""
    from rayindex.searcher import IndexReader

    analyzer, _, search_cfg = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in BM25_QUERIES:
        res = r.search(qtext, k=18, search_cfg=search_cfg, analyzer=analyzer,
                       lang="de")
        for doc, score in res:
            rows["query_id"].append(qid)
            rows["doc_id"].append(int(id_map[doc]))
            rows["score_micro"].append(int(np.rint(score * 1e6)))
    return _micro_rank(rows, 10)


_FED_CACHE: dict[str, Any] = {}


def _ensure_fed_indexes(sf_dir: str):
    """Two sub-indexes over a deterministic doc_id-parity split of the
    corpus — the base+delta shape query-time federation serves."""
    if sf_dir in _FED_CACHE:
        return _FED_CACHE[sf_dir]
    import ray.data

    from rayindex.engine import adapt_documents, build_index

    analyzer, build_cfg, _ = _ascii_cfgs()
    outs, maps = [], []
    for par in (0, 1):
        out = os.path.join(
            "/tmp/rayindex_entry",
            os.path.basename(os.path.normpath(sf_dir))
            + f"_fed{par}_" + build_cfg.fingerprint())
        ds = _read_parquet(
            _docs_path(sf_dir), columns=["doc_id", "text", "lang", "source"])

        def keep(t: pa.Table, p=par) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), p))

        ds = ds.map_batches(keep, batch_format="pyarrow",
                            zero_copy_batch=True)
        ds = adapt_documents(ds, repo_col="source", path_col="doc_id",
                             lang_col="lang", content_col="text")
        build_index(ds, out, build_cfg,
                    input_token=f"testdata-fed{par}:{_docs_path(sf_dir)}")
        store = pq.read_table(os.path.join(out, "doc_store"),
                              columns=["doc_id", "path"])
        eng = store["doc_id"].to_numpy()
        orig = np.asarray([int(p) for p in store["path"].to_pylist()],
                          np.int64)
        id_map = np.zeros(int(eng.max()) + 1, np.int64)
        id_map[eng] = orig
        outs.append(out)
        maps.append(id_map)
    _FED_CACHE[sf_dir] = (outs, maps)
    return _FED_CACHE[sf_dir]


def _q_federated_bm25_topk(sf_dir: str) -> pa.Table:
    """BM25 top-10 federated over two sub-indexes (doc-id-parity split)
    WITHOUT merging — query-time doc-id rebase + summed statistics
    (federate.FederatedReader).  Must equal global BM25 over the whole
    corpus: the oracle is the same SQL as bm25_topk."""
    from rayindex.federate import FederatedReader

    analyzer, _, search_cfg = _ascii_cfgs()
    dirs, maps = _ensure_fed_indexes(sf_dir)
    fed = FederatedReader(dirs)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in BM25_QUERIES:
        res = fed.search(qtext, k=18, search_cfg=search_cfg,
                         analyzer=analyzer)
        if res:
            g = np.array([d for d, _ in res], np.int64)
            sub, local = fed.route(g)
            for s, l, (_, score) in zip(sub, local, res):
                rows["query_id"].append(qid)
                rows["doc_id"].append(int(maps[int(s)][int(l)]))
                rows["score_micro"].append(int(np.rint(score * 1e6)))
    return _micro_rank(rows, 10)


def _ensure_upserted(sf_dir: str) -> str:
    """Full incremental-upsert lifecycle (rayindex/upsert.py): every
    doc_id % 7 == 3 source doc gets a new revision (text + a marker
    suffix) and every doc_id % 11 == 5 doc spawns a brand-new insert at
    doc_id + 10_000_000; the batch upserts into the base index (delta
    build + O(n_superseded) tombstones + federation manifest), then
    consolidates (merge_many + compact purge).  Returns the consolidated
    index dir — which must equal a fresh build over the logically
    updated corpus."""
    index_dir, _ = _ensure_index(sf_dir)
    final = index_dir + "_upserted"
    if os.path.exists(os.path.join(final, "stats",
                                   "collection_stats.parquet")):
        return final
    import ray.data

    from rayindex.engine import adapt_documents
    from rayindex.upsert import consolidate_upsert, upsert_index

    _, build_cfg, _ = _ascii_cfgs()
    ds = _read_parquet(
        _docs_path(sf_dir), columns=["doc_id", "text", "lang", "source"])

    def make_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.cast(t["text"], pa.string())
        upd = t.filter(pc.equal(pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 7), 7)), 3))
        upd_text = pc.binary_join_element_wise(
            pc.cast(upd["text"], pa.string()), " zzupserted marker", "")
        ins = t.filter(pc.equal(pc.subtract(
            t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 11), 11)), 5))
        ins_text = pc.binary_join_element_wise(
            "zzbrandnew ", pc.cast(ins["text"], pa.string()), "")
        return pa.concat_tables([
            pa.table({"doc_id": upd["doc_id"], "text": upd_text,
                      "lang": upd["lang"], "source": upd["source"]}),
            pa.table({"doc_id": pc.add(ins["doc_id"], 10_000_000),
                      "text": ins_text, "lang": ins["lang"],
                      "source": ins["source"]}),
        ])

    batch = ds.map_batches(make_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    batch = adapt_documents(batch, repo_col="source", path_col="doc_id",
                            lang_col="lang", content_col="text")
    fed = index_dir + "_upsert_fed"
    if not os.path.exists(os.path.join(fed, "federation.json")):
        upsert_index(index_dir, fed, batch, build_cfg,
                     input_token=f"testdata-upsert:{_docs_path(sf_dir)}")
    consolidate_upsert(fed, final, build_cfg)
    return final


def _q_upsert_term_stats(sf_dir: str) -> pa.Table:
    """Term stats off the CONSOLIDATED upsert (delta build + tombstoned
    supersede + merge + compact): vocabulary/df/cf must equal a full
    re-index of the logically updated corpus — the oracle is the
    term_stats SQL over that corpus expressed as a UNION ALL."""
    import glob

    final = _ensure_upserted(sf_dir)
    parts = [
        pq.read_table(f, columns=["term", "df", "cf"])
        for f in sorted(glob.glob(os.path.join(final, "shards",
                                               "*.dict.parquet")))
    ]
    return pa.concat_tables(parts)


def _q_boolean_and_docs(sf_dir: str) -> pa.Table:
    from rayindex.config import SearchConfig
    from rayindex.query import parse_query
    from rayindex.scoring import boolean_docs
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    q = parse_query("scan AND customer", analyzer)
    # oracle view: the K5 cap (500) must select the same members as the
    # SQL's ORDER BY doc_id LIMIT 500, so cap AFTER the external-id sort
    # (the engine's own internal-order cap is pytest-gated separately)
    docs = boolean_docs(r, q, r.stats, SearchConfig(boolean_cap=1 << 62))
    return pa.table({"doc_id": pa.array(
        np.sort(id_map[docs])[:500], pa.int64())})


def _q_phrase_match_docs(sf_dir: str) -> pa.Table:
    from rayindex.query import parse_query
    from rayindex.scoring import _phrase_docs
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    q = parse_query('"table scan"', analyzer)
    docs = _phrase_docs(r, q.parts[0])
    return pa.table({"doc_id": pa.array(np.sort(id_map[docs]), pa.int64())})


def _q_proximity_docs(sf_dir: str) -> pa.Table:
    from rayindex.query import parse_query
    from rayindex.scoring import proximity_docs
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    q = parse_query("#3(spark,customer)", analyzer)
    docs = proximity_docs(r, q)
    return pa.table({"doc_id": pa.array(np.sort(id_map[docs]), pa.int64())})


LM_QUERIES = [(0, "scan"), (1, "merge"), (2, "spark"), (3, "window"),
              (4, "zzznosuchterm")]


def _q_lm_topk(sf_dir: str) -> pa.Table:
    """LM-Dirichlet (mu=1089, df-as-cf reference quirk A3) top-10 for
    single-term queries — exercises the LM scorer against a SQL oracle."""
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in LM_QUERIES:
        res = r.search(qtext, k=18, analyzer=analyzer, scorer="lm-dirichlet")
        for doc, score in res:
            rows["query_id"].append(qid)
            rows["doc_id"].append(int(id_map[doc]))
            rows["score_micro"].append(int(np.rint(score * 1e6)))
    return _micro_rank(rows, 10)


VSM_QUERIES = [(0, "dup"), (1, "dup scan"), (2, "dup merge window"),
               (3, "dup zzznosuchterm"), (4, "scan merge")]


def _q_vsm_scores(sf_dir: str) -> pa.Table:
    """VSM cosine scorer parity (reference vsm_model.py semantics: union
    candidates, log10 weights, >=0 clamp, df<N guard): every positive
    (query, doc, score) pair, uncapped — on this corpus all positive
    cosines tie (one rare term), so top-k rank order is vacuous but the
    VALUES fully exercise the formula; search-level vsm ranking is gated
    by the rank-identity pytest."""
    from rayindex import analysis
    from rayindex.config import SearchConfig
    from rayindex.scoring import rank_singles
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in VSM_QUERIES:
        toks = analysis.tokenize_text(qtext, analyzer)
        res = rank_singles(r, toks, "vsm", r.stats, SearchConfig())
        if res is None:
            continue
        docs, scores = res
        # same HALF-AWAY rule as _micro_cols (DuckDB round parity)
        x = scores * 1e6
        micro = np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)
        keep = micro > 0
        rows["query_id"].extend([qid] * int(keep.sum()))
        rows["doc_id"].extend(id_map[docs[keep]].tolist())
        rows["score_micro"].extend(micro[keep].tolist())
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "score_micro": pa.array(rows["score_micro"], pa.int64()),
    })


def _q_lm_pyp_topk(sf_dir: str) -> pa.Table:
    """LM Pitman-Yor (mu=1303, g=0.2, df-as-cf quirk) top-10 for
    single-term queries — the reference's DEFAULT language model
    (language_model.py:18-51)."""
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    rows = {"query_id": [], "doc_id": [], "score_micro": []}
    for qid, qtext in LM_QUERIES:
        res = r.search(qtext, k=18, analyzer=analyzer, scorer="lm")
        for doc, score in res:
            rows["query_id"].append(qid)
            rows["doc_id"].append(int(id_map[doc]))
            rows["score_micro"].append(int(np.rint(score * 1e6)))
    return _micro_rank(rows, 10)


def _q_boolean_or_docs(sf_dir: str) -> pa.Table:
    from rayindex.config import SearchConfig
    from rayindex.query import parse_query
    from rayindex.scoring import boolean_docs
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    q = parse_query("scan OR window", analyzer)
    docs = boolean_docs(r, q, r.stats, SearchConfig(boolean_cap=1 << 62))
    return pa.table({"doc_id": pa.array(np.sort(id_map[docs])[:500], pa.int64())})


def _q_boolean_andnot_docs(sf_dir: str) -> pa.Table:
    from rayindex.config import SearchConfig
    from rayindex.query import parse_query
    from rayindex.scoring import boolean_docs
    from rayindex.searcher import IndexReader

    analyzer, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    q = parse_query("scan AND NOT window", analyzer)
    docs = boolean_docs(r, q, r.stats, SearchConfig(boolean_cap=1 << 62))
    return pa.table({"doc_id": pa.array(np.sort(id_map[docs])[:500], pa.int64())})


def _q_rerank_boost(sf_dir: str) -> pa.Table:
    """Deterministic rerank (reference F9/K6 title-boost semantics): base
    score = tf('scan') per doc (integer → exact float), multiplied 1.1×
    per title-field word present in the query terms (title field = the
    source column), re-sorted.  The recency leg needs a date column the
    corpus lacks; it is unit-gated with an injected 'today'."""
    from rayindex.rerank import rerank_results
    from rayindex.searcher import IndexReader

    _, _, _ = _ascii_cfgs()
    index_dir, id_map = _ensure_index(sf_dir)
    r = IndexReader(index_dir)
    p = r.lookup("scan", need_positions=False)
    store = pq.read_table(os.path.join(index_dir, "doc_store"),
                          columns=["doc_id", "repo"])
    meta = {int(d): {"repo": s} for d, s in
            zip(store["doc_id"].to_pylist(), store["repo"].to_pylist())}
    results = [(int(d), float(tf)) for d, tf in zip(p.docs, p.tfs)]
    out = rerank_results(results, meta, query_terms={"scan", "src3"},
                         title_field="repo")
    return pa.table({
        "doc_id": pa.array([int(id_map[d]) for d, _ in out], pa.int64()),
        "score_micro": pa.array([int(np.rint(s * 1e6)) for _, s in out],
                                pa.int64()),
    })


def _q_embedding_neardup(sf_dir: str) -> pa.Table:
    import ray.data

    from rayindex.datapipe.ann import cosine_neardup

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = _read_parquet(emb_path, columns=["vec_id", "embedding"])
    df = cosine_neardup(ds, threshold=0.4, dtype=np.float64).to_pandas()
    if df.empty:  # Ray collapses an all-empty dataset to zero columns
        return pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cos_sim_micro": pa.array([], pa.int64()),
        })
    t = pa.table({
        "id_a": pa.array(df["id_a"].to_numpy(np.int64)),
        "id_b": pa.array(df["id_b"].to_numpy(np.int64)),
        "cos_sim": pa.array(df["cos_sim"].to_numpy(np.float64)),
    })
    return _micro_cols(t, ("cos_sim",))


def _q_token_count(sf_dir: str):
    import ray.data

    from rayindex.datapipe.text import token_count_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_quality(sf_dir: str):
    import ray.data

    from rayindex.datapipe.text import quality_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.map_batches(
        lambda t: _micro_cols(t, ("stopword_ratio", "avg_token_len")),
        batch_format="pyarrow")


def _q_repetition(sf_dir: str):
    """Gopher-style within-document repetition quality signals
    (duplicate-line fractions, top 2-gram coverage, duplicated-5-gram
    position coverage — Rae et al. 2021 §A1.1): one shuffle-free
    ``map_batches`` pass; float ratios emitted as integer micro-units for
    the cross-engine hash."""
    import ray.data

    from rayindex.datapipe.text import repetition_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = ds.map_batches(repetition_batch, batch_format="pyarrow",
                         zero_copy_batch=True)
    return out.map_batches(
        lambda t: _micro_cols(t, ("dup_line_frac", "dup_line_char_frac",
                                  "top_2gram_char_frac",
                                  "dup_5gram_char_frac")),
        batch_format="pyarrow")


def _q_chunk_documents(sf_dir: str):
    """RAG sliding-window chunking (window 64, stride 48): map-only,
    one repeat/cumsum ladder + gather + ListArray join per batch."""
    from rayindex.datapipe.pack import chunk_documents

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return chunk_documents(ds, window=64, stride=48)


def _q_dataset_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment by FNV key hash
    interval — leakage-proof by construction, map-only."""
    from rayindex.datapipe.sampling import dataset_split

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id"])
    return dataset_split(ds, {"train": 0.8, "val": 0.1, "test": 0.1})


def _q_top_bigrams(sf_dir: str):
    """Corpus top-20 bigram collocations: within-batch-combined partial
    counts -> groupby(w1,w2) sum -> native sort+limit (the driver sees
    20 rows, never the vocabulary)."""
    from rayindex.datapipe.lm import top_bigrams

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return top_bigrams(ds, n=20)


def _q_curate(sf_dir: str):
    """End-to-end curation chain: quality gate (n_tokens >= 5) +
    repetition gates (dup_line_frac <= 0.30, top_2gram_char_frac <=
    0.25) + decontamination vs the doc_id < 25 bench slice (5-grams) +
    exact dedup keeping the lowest id.  All signals in ONE shared
    map_batches pass; the dedup groupby is the only shuffle."""
    import pyarrow.dataset as pads

    from rayindex.datapipe.curate import benchmark_gram_set, curate

    bench = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"],
                          filter=pads.field("doc_id") < 25)
    grams = benchmark_gram_set(bench, n=5)
    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return curate(ds, grams, min_tokens=5, max_dup_line_frac=0.30,
                  max_top2_frac=0.25, decontam_n=5)


def _q_tfidf_topk(sf_dir: str):
    """Per-doc top-5 TF-IDF keywords, auto-routed on measured vocab
    size: broadcast df table + map-only scoring here (small vocab), or
    the driver-free scale path (distributed df hash-join + bucketed
    per-doc top-k) past vocab_cap — both bitwise identical
    (pytest-gated: test_tfidf_bucketed_path_bitwise_matches_broadcast).
    sklearn smooth-idf convention; ties (score desc, term asc)."""
    import ray.data

    from rayindex.datapipe.keywords import tfidf_topk

    import os

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = tfidf_topk(ds, k=5,
                     path=os.environ.get("RAYINDEX_SCALE_PATH") or None)
    return out.map_batches(lambda t: _micro_cols(t, ("score",)),
                           batch_format="pyarrow")


def _q_decontaminate(sf_dir: str):
    """GPT-3-style benchmark decontamination: the "benchmark" is the
    doc_id < 25 slice; every doc sharing a distinct token 5-gram
    (Karp-Rabin over FNV-1a hashes — the corpus-wide convention) with it
    is flagged.  Bench gram set broadcast once; scoring map-only."""
    import pyarrow.dataset as pads

    from rayindex.datapipe.spans import benchmark_gram_set, decontaminate

    bench = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"],
                          filter=pads.field("doc_id") < 25)
    grams = benchmark_gram_set(bench, n=5)
    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return decontaminate(ds, grams, n=5)


def _q_lm_xent(sf_dir: str):
    """CCNet/Gopher-style LM quality scoring: per-doc cross-entropy
    under a corpus bigram model with add-0.1 smoothing, auto-routed on
    the measured bigram-table size — broadcast model + map-only scoring
    here (small table), or the driver-free scale path (pair-row
    left-outer hash-joins + one groupby(id) sum) past table_cap;
    micro-unit-identical (pytest-gated:
    test_lm_xent_bucketed_path_matches_broadcast)."""
    import ray.data

    from rayindex.datapipe.lm import lm_xent

    import os

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = lm_xent(ds, alpha=0.1,
                  path=os.environ.get("RAYINDEX_SCALE_PATH") or None)
    return out.map_batches(lambda t: _micro_cols(t, ("xent",)),
                           batch_format="pyarrow")


def _q_cdc_chunks(sf_dir: str):
    """Content-defined chunking (Rabin/LBFS boundary rule at token
    granularity, expected chunk 64 tokens): map-only, shuffle-free;
    chunk hashes via the vectorized weighted-prefix Karp-Rabin,
    bit-identical to the corpus Horner convention (DuckDB list_reduce
    twin)."""
    from rayindex.datapipe.spans import cdc_chunks

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return cdc_chunks(ds, k=4, mask_bits=6)


def _q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): distributed k-means over the
    embedding space (deterministic init="first", one update — the
    kmeans_clusters fixture), within-cluster cosine pairs >= 0.4,
    connected components, keep the lowest-id representative per
    semantic-duplicate group.  Full DuckDB twin (k-means CTE + cosine
    pair join + recursive closure)."""
    from rayindex.datapipe.ann import semdedup

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = _read_parquet(emb_path, columns=["vec_id", "embedding"])
    return semdedup(ds, k=4, threshold=0.4, n_iter=1, init="first")


def _q_perplexity_buckets(sf_dir: str):
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per-doc
    LM cross-entropy → int micro-nats → exact distributed tercile cuts
    → head/middle/tail labels.  Integer-exact end to end (the cuts and
    comparisons run on micro ints), full DuckDB twin."""
    from rayindex.datapipe.lm import perplexity_buckets

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return perplexity_buckets(ds, n_buckets=3, alpha=0.1)


def _q_exact_dedup(sf_dir: str):
    import ray.data

    from rayindex.datapipe.dedup import exact_dedup

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return exact_dedup(ds)


def _q_langid(sf_dir: str):
    import ray.data

    from rayindex.datapipe.text import langid_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = ds.map_batches(langid_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.map_batches(lambda t: _micro_cols(t, ("lang_conf",)),
                           batch_format="pyarrow")


def _q_simhash(sf_dir: str):
    import ray.data

    from rayindex.datapipe.dedup import simhash_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(simhash_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_fingerprint(sf_dir: str):
    import ray.data

    from rayindex.datapipe.text import fingerprint_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_winnow_fingerprints(sf_dir: str):
    """Winnowing (MOSS) substring fingerprints: Karp-Rabin k-gram
    hashes, leftmost-min pick per sliding window (datapipe/spans.py) —
    the passage-level dup signal whole-doc near-dup can't produce.
    Oracle: the identical pick computed in DuckDB list kernels."""
    from rayindex.datapipe.spans import winnow_fingerprints

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return winnow_fingerprints(ds, k=4, window=4)


def _q_winnow_dup_stats(sf_dir: str):
    """Per-doc duplicated-passage profile over winnowing fingerprints:
    n_dup_fps counts fingerprints shared with at least one OTHER doc
    (two native groupby exchanges over O(tokens/window) rows)."""
    from rayindex.datapipe.spans import duplicate_span_stats

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return duplicate_span_stats(ds, k=4, window=4)


def _q_span_attribution(sf_dir: str):
    """Cross-doc span attribution (who copied whom): (doc_a, doc_b,
    n_shared_fps) pairs counting distinct shared winnowing fingerprints,
    boilerplate-capped at 64 docs/fp — two bucketed exchanges over
    fingerprint rows, documents never shuffle."""
    from rayindex.datapipe.spans import span_attribution

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return span_attribution(ds, k=4, window=4, max_docs_per_fp=64)


def _q_dedup_substrings(sf_dir: str):
    """EXACT duplicated-substring removal (Lee et al. 2022 semantics):
    cut every token covered by a k-gram occurring more than once in the
    corpus; winnowing is the candidate pre-filter at extreme scale.
    Oracle: the identical cut computed in DuckDB (dup grams by GROUP BY,
    coverage join, string_agg reconstruction)."""
    from rayindex.datapipe.spans import dedup_substrings

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return dedup_substrings(ds, k=5)


def _q_minhash_pairs(sf_dir: str):
    import ray.data

    from rayindex.datapipe.dedup import minhash_candidates

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    # est_jaccard values are exact multiples of 1/64 — safe as doubles
    return minhash_candidates(ds, num_perm=64, bands=16)


def _q_neardup_verified(sf_dir: str) -> pa.Table:
    """Full near-dup pipeline: MinHash-LSH candidates → exact n-gram
    Jaccard verification (the candidate-then-verify pattern at scale)."""
    import ray.data

    from rayindex.datapipe.dedup import minhash_candidates, verify_candidates

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    pairs = minhash_candidates(ds, num_perm=64, bands=16)
    out = verify_candidates(ds, pairs, shingle_k=5, min_jaccard=0.5)
    return out.map_batches(lambda t: _micro_cols(t, ("jaccard",)),
                           batch_format="pyarrow")


def _q_ngram_jaccard(sf_dir: str):
    """EXACT n-gram Jaccard self-join (prefix-filtered AllPairs shape, no
    LSH false negatives) — the oracle is the full O(N^2)-complete DuckDB
    shingle join, so a hash match proves candidate completeness."""
    import ray.data

    from rayindex.datapipe.dedup import ngram_jaccard_pairs

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, min_jaccard=0.4, shingle_k=5)
    return out.map_batches(lambda t: _micro_cols(t, ("jaccard",)),
                           batch_format="pyarrow")


def _q_neardup_clusters(sf_dir: str):
    """Near-dup pairs → connected components (node, comp=min reachable
    id): iterative min-label contraction in pure Ray Data groupbys +
    hash-bucketed label joins — the fuzzy-dedup clustering step the
    reference stops short of.  Oracle: DuckDB recursive CTE transitive
    closure over the same exact-Jaccard pair graph."""
    import ray.data

    from rayindex.datapipe.clusters import connected_components
    from rayindex.datapipe.dedup import ngram_jaccard_pairs

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, min_jaccard=0.4, shingle_k=5)
    return connected_components(pairs)


def _q_dedup_keep_canonical(sf_dir: str):
    """Surviving doc ids after near-dup clustering: drop every doc in a
    pair-graph component except the component's minimum id (broadcast
    victim anti-filter; no corpus shuffle)."""
    import ray.data

    from rayindex.datapipe.clusters import dedup_keep_canonical
    from rayindex.datapipe.dedup import ngram_jaccard_pairs

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(ds, min_jaccard=0.4, shingle_k=5)
    return dedup_keep_canonical(ds, pairs).select_columns(["doc_id"])


def _q_hash_sample(sf_dir: str):
    """Deterministic 25% corpus sample: keep iff fnv1a64(doc_id) % 1e6
    < 250000 — stateless map_batches filter, no shuffle, resume-safe
    (the keep/drop decision is a pure function of the row)."""
    import ray.data

    from rayindex.datapipe.sampling import hash_sample

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])
    return hash_sample(ds, rate=0.25)


_STRAT_RATES = {"en": 0.1, "zh": 1.0, "fr": 0.5}


def _q_stratified_sample(sf_dir: str):
    """Per-language mixture weighting: downsample en to 10%, keep all
    zh, halve fr, default 30% — the training-mixture knob, same
    deterministic key-hash rule per stratum."""
    import ray.data

    from rayindex.datapipe.sampling import stratified_sample

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "lang"])
    return stratified_sample(ds, _STRAT_RATES, strata_col="lang",
                             default_rate=0.3)


def _q_redact_pii(sf_dir: str):
    """Vectorized PII redaction (email / IPv4 / phone → typed
    placeholders): one RE2 pass per pattern via
    pc.replace_substring_regex, no Python per row.  The oracle runs the
    SAME RE2 patterns through DuckDB regexp_replace(..., 'g')."""
    import ray.data

    from rayindex.datapipe.text import redact_pii_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(redact_pii_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_normalize_text(sf_dir: str):
    """Canonical text form (NFC → lower → collapse whitespace → trim);
    ASCII rows stay entirely in Arrow kernels, non-ASCII rows take the
    unicodedata NFC path (pyarrow 16.1's utf8_normalize mis-implements
    NFC)."""
    import ray.data

    from rayindex.datapipe.text import normalize_text_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(normalize_text_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_top_k_per_group(sf_dir: str):
    """Top-3 longest docs per language — per-batch partial top-k (only
    k rows per group per batch ever shuffle) then a small final cut;
    ties break on ascending doc_id, matching the oracle's row_number
    window."""
    import ray.data

    from rayindex.datapipe.select import top_k_per_group

    ds = _read_parquet(_docs_path(sf_dir),
                               columns=["doc_id", "lang", "n_chars"])
    return top_k_per_group(ds, group_col="lang", order_col="n_chars", k=3)


def _q_length_quantiles(sf_dir: str):
    """Exact doc-length quantiles via the distinct-value histogram
    combiner — per-batch (value, count) partials, native groupby sum,
    driver sees one row per DISTINCT length (corpus-size independent)."""
    import ray.data

    from rayindex.datapipe.stats import value_quantiles

    ds = _read_parquet(_docs_path(sf_dir), columns=["n_chars"])
    return value_quantiles(ds, "n_chars",
                           qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))


def _q_float_quantiles(sf_dir: str):
    """Exact quantile_disc over a CONTINUOUS column (events.value) via
    iterative distributed histogram narrowing — driver holds ≤ nq × bins
    rows per round, never the values; the ranked element is picked
    inside a per-quantile map_groups task.  Micro-scaled to int64 for
    the hash compare."""
    import ray.data

    from rayindex.datapipe.stats import float_quantiles

    ds = _events(sf_dir, cols=["value"])
    out = float_quantiles(ds, "value", qs=(0.05, 0.25, 0.5, 0.75, 0.95))
    out["value_micro"] = (out["value"] * 1e6).round().astype("int64")
    return out[["q", "value_micro"]]


def _q_simhash_pairs(sf_dir: str):
    """Exact SimHash near-dup pairs (hamming <= t via 64-bit banding +
    in-group popcount filter) — the banded candidate→verify shape closed
    under one operator."""
    import ray.data

    from rayindex.datapipe.dedup import simhash_pairs

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=8)


def _q_embedding_neardup_lsh(sf_dir: str):
    """Hyperplane-LSH bucketed near-dup candidates (precision 1.0 vs the
    exact pass; recall < 1.0) — the 10^9-vector scale path for
    embedding_neardup."""
    import ray.data

    from rayindex.datapipe.ann import cosine_neardup_lsh

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = _read_parquet(emb_path, columns=["vec_id", "embedding"])
    out = cosine_neardup_lsh(ds, threshold=0.4, nbits=16, bands=8,
                             dtype=np.float64)
    return out.map_batches(lambda t: _micro_cols(t, ("cos_sim",)),
                           batch_format="pyarrow")


def _q_knn_cosine(sf_dir: str) -> pa.Table:
    import ray.data

    from rayindex.datapipe.ann import knn_brute

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    mask = np.asarray(qt["vec_id"].to_numpy() < 8)
    q_ids = qt["vec_id"].to_numpy()[mask]
    queries = np.stack([np.asarray(v, np.float64)
                        for v, m in zip(qt["embedding"].to_pylist(), mask) if m])
    ds = _read_parquet(emb_path, columns=["vec_id", "embedding"])
    res = knn_brute(ds, queries, k=5, dtype=np.float64)
    import pyarrow.compute as pc

    qid = pc.take(pa.array(q_ids, pa.int64()), res["query_id"])
    res = res.set_column(0, "query_id", qid)
    return _micro_cols(res, ("cos_sim",))


def _q_kmeans_clusters(sf_dir: str):
    """Distributed Lloyd's k-means (k=4, one update from the k lowest-id
    seeds, L2): per-iteration map_batches partial sums reduced by a
    cluster-side groupby — the driver holds k × d floats only.  Output is
    the integer cluster assignment against the updated centroids, which a
    two-step DuckDB argmin/avg CTE chain reproduces exactly."""
    import ray.data

    from rayindex.datapipe.ann import kmeans_assign, kmeans_fit

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    ds = _read_parquet(emb_path, columns=["vec_id", "embedding"])
    cents, _ = kmeans_fit(ds, k=4, n_iter=1, init="first",
                          metric="l2", dtype=np.float64)
    out = kmeans_assign(ds, cents, metric="l2", dtype=np.float64)
    return out.select_columns(["vec_id", "cluster"])


def _quantize_vecs(mat: np.ndarray) -> np.ndarray:
    """The integer-lattice fixture quantizer: ``floor(8·x + 0.5)`` as
    float64.  8 is a power of two so the scaling is float-exact, and
    from here every distance/dot in the knn_* lattice entries is a sum
    of integers — exactly representable in doubles in ANY summation
    order, which is what makes the seeded-float ANN operators
    SQL-oracle-able (VERDICT r4 item 2).  The same formula runs in the
    DuckDB twins verbatim."""
    return np.floor(mat * 8.0 + 0.5)


def _quantized_emb_ds(sf_dir: str):
    """(quantized Dataset, quantized query matrix for vec_id < 4,
    ordered query ids) over the embeddings table."""
    import ray.data

    from rayindex.datapipe.ann import _batch_matrix

    emb_path = os.path.join(sf_dir, "embeddings.parquet")

    def quant(batch: pa.Table) -> pa.Table:
        x = _quantize_vecs(_batch_matrix(batch, "embedding", np.float64))
        return pa.table({"vec_id": batch["vec_id"],
                         "embedding": pa.array(list(x))})

    ds = _read_parquet(emb_path, columns=["vec_id", "embedding"]) \
        .map_batches(quant, batch_format="pyarrow", zero_copy_batch=True)
    qt = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    order = np.argsort(qt["vec_id"].to_numpy(), kind="stable")[:4]
    q_ids = qt["vec_id"].to_numpy()[order]
    queries = _quantize_vecs(np.stack(
        [np.asarray(qt["embedding"][int(i)].as_py(), np.float64)
         for i in order]))
    return ds, queries, q_ids


def _lattice_books(m: int = 8, k: int = 16, w: int = 8) -> np.ndarray:
    """Pinned constant-level PQ codebooks: centroid j in every subspace
    is the constant vector (j − 8) — integer lattice levels, so encode
    argmins and ADC LUT sums are integer-exact and the DuckDB twin
    reduces to per-subspace (Σx², Σx) aggregates."""
    lev = (np.arange(k) - 8).astype(np.float64)
    return np.ascontiguousarray(
        np.broadcast_to(lev[None, :, None], (m, k, w)))


def _q_knn_pq(sf_dir: str) -> pa.Table:
    """PQ ADC top-k (Jégou et al. 2011) through the REAL pq_encode /
    knn_pq kernels, on the integer-lattice fixture: quantized vectors +
    pinned constant-level codebooks make every argmin and LUT sum
    integer-exact, so the full encode→LUT→ADC→top-k chain has an exact
    DuckDB twin (distributed float codebook TRAINING is kmeans_fit —
    oracled via kmeans_clusters and pytest-gated for PQ recall/
    determinism in test_pq_adc_recall)."""
    from rayindex.datapipe.ann import knn_pq, pq_encode

    ds, queries, q_ids = _quantized_emb_ds(sf_dir)
    books = _lattice_books()
    codes = pq_encode(ds, books)
    res = knn_pq(codes, queries, books, k=5)
    import pyarrow.compute as pc
    qid = pc.take(pa.array(q_ids, pa.int64()), res["query_id"])
    return _micro_cols(res.set_column(0, "query_id", qid), ("adc_dist",))


def _q_knn_ivf(sf_dir: str) -> pa.Table:
    """IVF probe-and-score through the real knn_ivf kernel on the
    integer-dot fixture: quantized vectors, pinned coarse centroids
    (the 8 lowest-vec_id quantized vectors), normalize=False raw-dot
    routing/scoring — every dot is integer-exact, so routing, probe
    lists, candidate sets and scores all reproduce in the DuckDB twin
    (the seeded float cosine/training path is pytest-gated:
    test_knn_ivf_high_recall)."""
    from rayindex.datapipe.ann import knn_ivf

    ds, queries, q_ids = _quantized_emb_ds(sf_dir)
    head = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    hsel = np.argsort(head["vec_id"].to_numpy(), kind="stable")[:8]
    cents = _quantize_vecs(np.stack(
        [np.asarray(head["embedding"][int(i)].as_py(), np.float64)
         for i in hsel]))
    res = knn_ivf(ds, queries, k=5, nprobe=3, centroids=cents,
                  normalize=False, dtype=np.float64)
    import pyarrow.compute as pc
    qid = pc.take(pa.array(q_ids, pa.int64()), res["query_id"])
    return _micro_cols(res.set_column(0, "query_id", qid), ("cos_sim",))


def _q_knn_ivfpq(sf_dir: str) -> pa.Table:
    """Composed IVF-PQ search (Jégou 2011 §III — coarse L2 routing +
    residual PQ ADC within nprobe probed lists; the 10⁹-vector shape)
    through the real ivfpq_encode / knn_ivfpq kernels on the lattice
    fixture: quantized vectors, coarse centroids = 8 lowest-vec_id
    quantized vectors, constant-level residual codebooks — integer-
    exact end to end, full DuckDB twin.  Float training (ivfpq_train)
    is pytest-gated: test_ivfpq_composed_recall."""
    from rayindex.datapipe.ann import ivfpq_encode, knn_ivfpq

    ds, queries, q_ids = _quantized_emb_ds(sf_dir)
    head = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                         columns=["vec_id", "embedding"])
    hsel = np.argsort(head["vec_id"].to_numpy(), kind="stable")[:8]
    coarse = _quantize_vecs(np.stack(
        [np.asarray(head["embedding"][int(i)].as_py(), np.float64)
         for i in hsel]))
    books = _lattice_books()
    enc = ivfpq_encode(ds, coarse, books)
    res = knn_ivfpq(enc, queries, coarse, books, k=5, nprobe=3)
    import pyarrow.compute as pc
    qid = pc.take(pa.array(q_ids, pa.int64()), res["query_id"])
    return _micro_cols(res.set_column(0, "query_id", qid), ("adc_dist",))


def _q_events_window(sf_dir: str):
    import ray.data

    from rayindex.datapipe.windows import tumbling_window

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "value"])
    out = tumbling_window(ds, window_s=3600)
    return out.map_batches(
        lambda t: _micro_cols(t, ("sum_value", "min_value", "max_value")),
        batch_format="pyarrow")


def _q_sessionize(sf_dir: str):
    """Gap-based session windows (30-min inactivity splits) — the per-key
    ordered-state window operator; groupby(key) is the one unavoidable
    shuffle."""
    import ray.data

    from rayindex.datapipe.windows import sessionize

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts"])
    return sessionize(ds, gap_s=1800)


def _q_media_meta(sf_dir: str):
    """Multimodal plumbing: documents.text treated as an opaque binary
    payload column; metadata extraction without decode."""
    import ray.data

    from rayindex.datapipe.media import attach_media_meta

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def to_payload(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pc.cast(pc.cast(t["text"], pa.string()), pa.binary()),
        })

    return (
        ds.map_batches(to_payload, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(attach_media_meta, fn_kwargs={"payload_col": "payload"},
                     batch_format="pyarrow")
    )


def _q_media_features(sf_dir: str):
    """Real multimodal decode path: a deterministic P6 PPM raster is built
    from each document's bytes, then decoded/resized/featurized by the
    actor-pool MediaDecoder (backend="real" — pure-numpy PPM parser +
    block-mean resize, rayindex/datapipe/media.py).  Rows-only check:
    the float feature grid has no SQL expression."""
    import ray.data

    from rayindex.datapipe.media import decode_features

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def to_ppm(t: pa.Table) -> pa.Table:
        import numpy as np

        outs = []
        for s in t["text"].to_pylist():
            raw = np.frombuffer((s or " ").encode(), np.uint8)
            raster = np.resize(raw, 16 * 16 * 3)  # tile bytes to a 16x16 RGB
            outs.append(b"P6\n16 16\n255\n" + raster.tobytes())
        return pa.table({
            "doc_id": t["doc_id"],
            "payload": pa.array(outs, pa.large_binary()),
        })

    feats = decode_features(
        ds.map_batches(to_ppm, batch_format="pyarrow", zero_copy_batch=True),
        backend="real", feature_dim=16)

    def summarize(t: pa.Table) -> pa.Table:
        import numpy as np

        arr = t["feature"].combine_chunks()
        mat = arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), -1)
        return pa.table({
            "doc_id": t["doc_id"],
            "feature": arr,
            "feat_mean": pa.array(mat.mean(axis=1).astype(np.float64)),
        })

    return feats.map_batches(summarize, batch_format="pyarrow")


def _spell_corruptions(t: str) -> list[str]:
    """Four deterministic 1-edit corruptions of a term — the same string
    surgery the SQL oracle performs with substr(), so probe sets match."""
    return [
        t[:2] + t[3:],                 # drop 3rd char
        t[:2] + t[3] + t[2] + t[4:],   # swap chars 3 and 4
        t[:2] + "q" + t[3:],           # replace 3rd char with q
        t[:3] + "x" + t[3:],           # insert x after 3rd char
    ]


def _q_spellcheck(sf_dir: str) -> pa.Table:
    """Norvig spell correction (M15) over the index's own vocabulary:
    probes are deterministic 1-edit corruptions of the 8 highest-cf
    terms (len >= 6), so each has a distance-1 correction by
    construction, plus one garbage probe with no candidate.  The SQL
    oracle recomputes the same vocabulary, the same probes, and the same
    (damerau_levenshtein = 1, cf desc, term asc) selection."""
    from rayindex.searcher import IndexReader
    from rayindex.spell import SpellChecker

    index_dir, _ = _ensure_index(sf_dir)
    reader = IndexReader(index_dir)
    sp = SpellChecker.from_index(reader)
    terms = [(t, cf) for t, cf in reader.iter_terms() if len(t) >= 6]
    terms.sort(key=lambda x: (-x[1], x[0]))
    probes = [p for t, _ in terms[:8] for p in _spell_corruptions(t)]
    probes.append("zzqqzzqq")
    return pa.table({
        "probe": pa.array(probes, pa.string()),
        "corrected": pa.array([sp.correction(p) for p in probes], pa.string()),
    })


def _q_date_parse(sf_dir: str):
    """Date parser/filter (M3, reference drop-invalid semantics): a
    deterministic date-string column derived from doc_id (every 7th doc
    gets unparseable garbage, mirroring the reference's bad-date rows),
    parsed and filtered by one vectorized strptime kernel.  Day-of-month
    stays <= 28 so Arrow strptime and DuckDB try_strptime agree on
    validity for every probe."""
    import ray.data

    from rayindex.datapipe.text import parse_date_filter

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        strs = [f"bad{i}" if i % 7 == 3
                else f"{2000 + i % 30:04d}{1 + i % 12:02d}{1 + i % 28:02d}"
                for i in ids]
        return t.append_column("date_str", pa.array(strs, pa.string()))

    return (ds.map_batches(synth, batch_format="pyarrow")
              .map_batches(parse_date_filter, batch_format="pyarrow",
                           zero_copy_batch=True))


def _q_html_unescape(sf_dir: str):
    """HTML entity decode (M4): documents.text is wrapped in a
    deterministic entity-laden template (escape = exact inverse of the
    operator), then decoded by the chained vectorized replace kernels.
    The oracle builds the decoded expectation directly with string
    concatenation, so any decode error (missing entity, wrong order on
    '&amp;lt;'-style nesting) hash-mismatches."""
    import ray.data

    from rayindex.datapipe.text import html_escape_batch, html_unescape_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])

    def wrap(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        esc = html_escape_batch(t, "text")
        col = pc.binary_join_element_wise(
            pa.scalar('&lt;p id=&quot;&amp;lt;x&amp;gt;&quot;&gt; ', pa.string()),
            pc.cast(esc["text"], pa.string()),
            " &amp;tail &#39;end&#39;", "")
        return t.set_column(t.column_names.index("text"), "text", col)

    return (ds.map_batches(wrap, batch_format="pyarrow")
              .map_batches(html_unescape_batch, batch_format="pyarrow",
                           zero_copy_batch=True))


def _q_db_metadata(sf_dir: str) -> pa.Table:
    """DB metadata sink (S6–S8, T6): stream document metadata through
    the actor-pool DBAPI sink — one parameterized executemany + commit
    per batch, reconnect with bounded backoff (vs the reference's
    per-row interpolated INSERT + 900 s sleep-and-drop,
    db_updater.py:4-14) — into a SQLite side table, then read the table
    back.  The oracle is a bare projection of ``documents``: only a
    faithful, complete, type-stable round-trip matches
    rows+schema+hash.  Also exercises the truncator (S8, force-gated)
    so re-entry starts from an empty table."""
    import tempfile

    import ray.data

    from rayindex.db import (MetadataSink, read_table, sqlite_connect_fn,
                             truncate_table)

    cols = ["doc_id", "lang", "source", "n_chars"]
    db = os.path.join(tempfile.gettempdir(),
                      f"rayindex_dbsink_{os.getpid()}.sqlite")
    cf = sqlite_connect_fn(db)
    truncate_table(cf, "doc_metadata", force=True, missing_ok=True)
    src_schema = pq.read_schema(_docs_path(sf_dir))
    sunk = _read_parquet(_docs_path(sf_dir), columns=cols).map_batches(
        MetadataSink, batch_format="pyarrow", concurrency=2, batch_size=128,
        fn_constructor_kwargs=dict(
            connect_fn=cf, table="doc_metadata", columns=cols,
            create_from=pa.schema([src_schema.field(c) for c in cols])),
    ).sum("rows_written")
    t = read_table(cf, "doc_metadata", cols)
    if sunk != t.num_rows:
        raise AssertionError(f"sink wrote {sunk} rows, table holds {t.num_rows}")
    return t.sort_by("doc_id")


def _events(sf_dir: str, etype: str | None = None, cols=None):
    """events.parquet projected to ``cols``, optionally filtered to one
    event_type inside map_batches (vectorized, zero-copy)."""
    import ray.data

    cols = list(cols or ["event_id", "ts", "user_id", "value"])
    read_cols = cols + (["event_type"] if etype else [])
    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=read_cols)
    if etype is None:
        return ds

    def filt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["event_type"], etype)).select(cols)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def _q_asof_join(sf_dir: str):
    """Distributed as-of join: every click event picks the same user's
    most recent prior purchase (one groupby(key) shuffle + vectorized
    per-group searchsorted; inner ASOF semantics)."""
    from rayindex.datapipe.joins import asof_join

    clicks = _events(sf_dir, "click", ["user_id", "event_id", "ts"])
    purchases = _events(sf_dir, "purchase", ["user_id", "ts", "value"])
    out = asof_join(clicks, purchases, key_col="user_id",
                    left_ts_col="ts", right_ts_col="ts",
                    left_cols=("event_id",), right_cols=("value",))
    return out.map_batches(lambda t: _micro_cols(t, ("value",)),
                           batch_format="pyarrow")


def _q_interval_join(sf_dir: str):
    """Bucketed interval join: (purchase, click) pairs where the click
    lands in the hour before the purchase — time-bucket explode (≤2×)
    + distributed hash join on the fused (key, bucket) id + exact
    vectorized filter; hot keys spread across buckets."""
    import pyarrow.compute as pc

    from rayindex.datapipe.joins import interval_join

    purchases = _events(sf_dir, "purchase", ["user_id", "event_id", "ts"])
    clicks = _events(sf_dir, "click", ["user_id", "event_id", "ts"]).map_batches(
        lambda t: t.rename_columns(["user_id", "click_id", "ts"]),
        batch_format="pyarrow", zero_copy_batch=True)
    return interval_join(purchases, clicks, key_col="user_id",
                         left_ts_col="ts", right_ts_col="ts",
                         lo_us=-3_600_000_000, hi_us=0,
                         left_id_col="event_id", right_id_col="click_id",
                         num_partitions=4)


def _q_semi_join(sf_dir: str):
    """Broadcast semi-join: lineitem rows of URGENT orders — the order
    key set is ray.put once; lineitem streams through an is_in filter
    and never shuffles."""
    import ray.data

    from rayindex.datapipe.joins import semi_join

    li = _read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_linenumber",
                                        "l_quantity"])
    urgent = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pa.compute.equal(t["o_orderpriority"],
                                            "1-URGENT")),
        batch_format="pyarrow", zero_copy_batch=True)
    out = semi_join(li, urgent, big_col="l_orderkey",
                    small_col="o_orderkey")
    return out.map_batches(lambda t: _micro_cols(t, ("l_quantity",)),
                           batch_format="pyarrow")


def _q_anti_join(sf_dir: str):
    """Broadcast anti-join: customers with no URGENT order."""
    import ray.data

    from rayindex.datapipe.joins import anti_join

    cust = _read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_name"])
    urgent = _read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pa.compute.equal(t["o_orderpriority"],
                                            "1-URGENT")),
        batch_format="pyarrow", zero_copy_batch=True)
    return anti_join(cust, urgent, big_col="c_custkey",
                     small_col="o_custkey")


def _q_events_hopping(sf_dir: str):
    """Per-key hopping window (1 h window, 15 min hop): bounded 4×
    vectorized expansion inside map_batches, then the native combiner
    aggregate — raw events shuffle once, pre-grouped."""
    from rayindex.datapipe.windows import hopping_window

    ds = _events(sf_dir, None, ["user_id", "ts", "value"])
    out = hopping_window(ds, window_s=3600, hop_s=900)
    return out.map_batches(lambda t: _micro_cols(t, ("sum_value",)),
                           batch_format="pyarrow")


def _q_broadcast_join(sf_dir: str):
    """Broadcast enrich join: customers gain their nation name — the
    dimension table is sorted + ray.put once, the fact side streams
    through a vectorized searchsorted lookup with no shuffle."""
    import pyarrow.parquet as pq_
    import ray.data

    from rayindex.datapipe.joins import broadcast_join

    nation = pq_.read_table(os.path.join(sf_dir, "nation.parquet"),
                            columns=["n_nationkey", "n_name"])
    cust = _read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_nationkey"])
    return broadcast_join(cust, nation, big_col="c_nationkey",
                          small_col="n_nationkey", payload_cols=("n_name",))


def _q_lineitem_rollup(sf_dir: str):
    """TPC-H-Q1-style multi-aggregate rollup over lineitem: native
    combiner-based groupby (partial per block, small final exchange).
    Money is summed in exact integer ten-thousandths (price and
    discount carry 2 decimals each, so price*(1-disc) is exact at 4
    decimals) — float sums would be summation-order-dependent and
    could not hash-match the oracle."""
    import ray.data
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": pa.array(np.rint(qty).astype(np.int64)),
            "qty_f": pc.cast(t["l_quantity"], pa.float64()),
            "disc_price_c": pa.array(
                np.rint(price * (1.0 - disc) * 1e4).astype(np.int64)),
        })

    out = (ds.map_batches(prep, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty", alias_name="sum_qty"),
                      Sum("disc_price_c", alias_name="sum_disc_price_c"),
                      Mean("qty_f", alias_name="avg_qty"),
                      Count(alias_name="n_rows")))

    def post(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for c in ("sum_qty", "sum_disc_price_c", "n_rows"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.cast(t[c], pa.int64()))
        return _micro_cols(t, ("avg_qty",))

    return out.map_batches(post, batch_format="pyarrow")


def _q_token_count_bpe(sf_dir: str):
    """BPE-ish pretokenizer token counts (LLM token budgeting) — a pure
    Arrow RE2 kernel; DuckDB's regexp_extract_all runs the same RE2
    pattern, so counts match exactly."""
    import ray.data

    from rayindex.datapipe.text import token_count_bpe_batch

    ds = _read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(token_count_bpe_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_distinct_users(sf_dir: str):
    """Exact distributed COUNT(DISTINCT user_id) per event_type — the
    pair-dedup combiner (unique pairs per batch, one multi-key groupby,
    tiny per-group count); no per-group value set is ever held in heap."""
    import ray.data

    from rayindex.datapipe.sketch import distinct_per_group

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["event_type", "user_id"])
    return distinct_per_group(ds, group_col="event_type",
                              value_col="user_id")


def _q_hll_sketch(sf_dir: str):
    """HyperLogLog registers of events.user_id (p=12): per-batch
    vectorized FNV-1a + register fold, native groupby(bucket).max merge.
    The register table is integer-exact and SQL-reproducible (the hash
    and the smear+popcount bit-length have DuckDB twins), so a SKETCH
    gets a full rows+schema+hash oracle; the float estimate derived from
    it is pytest-gated (tests/test_sketch.py) at the theoretical error."""
    import ray.data

    from rayindex.datapipe.sketch import hll_register_table

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])
    return hll_register_table(ds, "user_id", p=12)


def _q_bloom_filter_events(sf_dir: str):
    """Bloom-filter blocklist anti-join: drop every event by a user who
    ever produced a severe (value > 200) 'error' event — a strict
    subset of users at every SF.  The blocklist side is folded into a
    4096-bit Bloom bitset (k=3) and broadcast once; the big side streams
    through a map_batches probe — no shuffle, and the bitset (not the
    key set) is the only driver/plasma state.  False positives are
    DETERMINISTIC given the hash chain, so the oracle reproduces the
    exact surviving row set bit-for-bit (including which innocent users
    were collaterally dropped)."""
    import ray.data

    from rayindex.datapipe.bloom import bloom_filter

    def severe(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.and_(pc.equal(t["event_type"], "error"),
                       pc.greater(t["value"], 200.0))
        return t.filter(keep).select(["user_id"])

    small = _read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value"]).map_batches(
            severe, batch_format="pyarrow", zero_copy_batch=True)
    big = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id", "user_id"])
    return bloom_filter(big, small, big_col="user_id",
                        m_bits=1 << 12, k=3, anti=True)


def _q_cms_sketch(sf_dir: str):
    """Count-min sketch of events.user_id (depth=4, width=512): per-batch
    partial count grids merged by a native groupby sum.  Cell counts are
    exact integer sums over deterministic double-hash cell assignments,
    so the sketch itself is rows+schema+hash oracle-checked; the min-over-
    depth estimates and their one-sided error guarantee are pytest-gated
    (tests/test_sketch.py)."""
    import ray.data

    from rayindex.datapipe.sketch import cms_cell_table

    ds = _read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id"])
    return cms_cell_table(ds, "user_id", depth=4, width=512)


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering matters: the driver's correctness harness records rows for
    # the FIRST 50 entries only.  Round 5: entries that are new or whose
    # implementation/oracle changed this round come first (lattice-
    # fixture ANN entries knn_pq/knn_ivf/knn_ivfpq, the newly-oracled
    # embedding_neardup_lsh, the auto-routed tfidf_topk/lm_xent, span
    # attribution); then never-recently-verified ones; the tail is
    # previously-driver-verified entries (green rows in r01-r04) and the
    # one remaining documented rows-only entry (media_features — binary
    # decode, pytest-gated).  Cumulatively every entry has a green row.
    return {
        # -- new or implementation/oracle-changed in round 5 --------------
        "span_attribution": _q_span_attribution,
        "knn_ivfpq": _q_knn_ivfpq,
        "knn_pq": _q_knn_pq,
        "knn_ivf": _q_knn_ivf,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "tfidf_topk": _q_tfidf_topk,
        "lm_xent": _q_lm_xent,
        "perplexity_buckets": _q_perplexity_buckets,
        "semdedup": _q_semdedup,
        "cdc_chunks": _q_cdc_chunks,
        # the one remaining rows-only entry (binary decode; pytest-gated)
        "media_features": _q_media_features,
        # -- last driver row r3 or earlier: re-verify at this revision ----
        "proximity_docs": _q_proximity_docs,
        "spellcheck": _q_spellcheck,
        "ranker_agreement": _q_ranker_agreement,
        "facet_lang_counts": _q_facet_lang_counts,
        "facet_repo_counts": _q_facet_repo_counts,
        "search_snippets": _q_search_snippets,
        "suggest_terms": _q_suggest_terms,
        "sequence_pack": _q_sequence_pack,
        "sessionize": _q_sessionize,
        "ngram_jaccard": _q_ngram_jaccard,
        "neardup_clusters": _q_neardup_clusters,
        "dedup_keep_canonical": _q_dedup_keep_canonical,
        "hash_sample": _q_hash_sample,
        "stratified_sample": _q_stratified_sample,
        "redact_pii": _q_redact_pii,
        "normalize_text": _q_normalize_text,
        "top_k_per_group": _q_top_k_per_group,
        "length_quantiles": _q_length_quantiles,
        "exact_dedup": _q_exact_dedup,
        "minhash_pairs": _q_minhash_pairs,
        "neardup_verified": _q_neardup_verified,
        "knn_cosine": _q_knn_cosine,
        "token_count": _q_token_count,
        "quality": _q_quality,
        "langid": _q_langid,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "fingerprint": _q_fingerprint,
        "events_window": _q_events_window,
        "media_meta": _q_media_meta,
        "embedding_neardup": _q_embedding_neardup,
        # -- index core (re-verified whenever window room remains) --------
        "term_stats": _q_term_stats,
        "merged_term_stats": _q_merged_term_stats,
        "deleted_term_stats": _q_deleted_term_stats,
        "compacted_postings_probe": _q_compacted_postings_probe,
        "collection_stats": _q_collection_stats,
        "postings_probe": _q_postings_probe,
        "bm25_topk": _q_bm25_topk,
        "bm25_topk_lang": _q_bm25_topk_lang,
        # ==== driver window (50) ends here ================================
        # (everything below has a green CORRECTNESS row in r01-r04)
        "boolean_and_docs": _q_boolean_and_docs,
        "boolean_or_docs": _q_boolean_or_docs,
        "boolean_andnot_docs": _q_boolean_andnot_docs,
        "vsm_scores": _q_vsm_scores,
        "lm_topk": _q_lm_topk,
        "lm_pyp_topk": _q_lm_pyp_topk,
        "rerank_boost": _q_rerank_boost,
        "phrase_match_docs": _q_phrase_match_docs,
        "db_metadata": _q_db_metadata,
        "date_parse": _q_date_parse,
        "html_unescape": _q_html_unescape,
        "asof_join": _q_asof_join,
        "interval_join": _q_interval_join,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "events_hopping": _q_events_hopping,
        "token_count_bpe": _q_token_count_bpe,
        "broadcast_join": _q_broadcast_join,
        "lineitem_rollup": _q_lineitem_rollup,
        "distinct_users": _q_distinct_users,
        "hll_sketch": _q_hll_sketch,
        "bloom_filter_events": _q_bloom_filter_events,
        "cms_sketch": _q_cms_sketch,
        "tombstone_postings_probe": _q_tombstone_postings_probe,
        "tombstone_bm25_topk": _q_tombstone_bm25_topk,
        "float_quantiles": _q_float_quantiles,
        "federated_bm25_topk": _q_federated_bm25_topk,
        "upsert_term_stats": _q_upsert_term_stats,
        "snapshot_term_stats": _q_snapshot_term_stats,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "winnow_dup_stats": _q_winnow_dup_stats,
        "dedup_substrings": _q_dedup_substrings,
        "repetition": _q_repetition,
        "kmeans_clusters": _q_kmeans_clusters,
        "decontaminate": _q_decontaminate,
        "curate": _q_curate,
        "chunk_documents": _q_chunk_documents,
        "top_bigrams": _q_top_bigrams,
        "dataset_split": _q_dataset_split,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_TOKS_CTE = f"""
docs AS (SELECT doc_id, regexp_extract_all(lower(text), {TOKEN_RE_SQL}) AS toks
         FROM documents),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
pos AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS p
        FROM docs),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
"""

# FNV-1a 64 over each token, in pure SQL: xor folds into the low 7 bits
# (byte < 128) so it stays in BIGINT; the multiply runs in HUGEINT mod 2^64
_FNV_CTE = """
tokl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
         FROM documents),
th AS (SELECT doc_id, generate_subscripts(tl, 1) AS i,
              list_reduce(
                list_prepend(CAST(14695981039346656037 AS HUGEINT),
                             list_transform(string_split(unnest(tl), ''),
                                            c -> CAST(ord(c) AS HUGEINT))),
                (h, b) -> ((h - (h % 128)
                            + CAST(xor(CAST(h % 128 AS BIGINT),
                                       CAST(b AS BIGINT)) AS HUGEINT))
                           * 1099511628211) % 18446744073709551616
              ) AS h
       FROM tokl)
"""


def _fnv64_id_sql(col: str) -> str:
    """FNV-1a over an int64's 8 little-endian bytes, as a DuckDB scalar
    expression — the exact twin of rayindex.datapipe.sampling.fnv1a_u64
    (verified bit-identical)."""
    expr = "CAST(14695981039346656037 AS UBIGINT)"
    for i in range(8):
        b = f"((CAST({col} AS UBIGINT) >> {8 * i}) & 255)"
        expr = (f"CAST((CAST(xor({expr}, {b}) AS HUGEINT) * 1099511628211)"
                f" % 18446744073709551616 AS UBIGINT)")
    return expr


def _mulmod64_sql(x: str, c: int) -> str:
    """``x * c mod 2**64`` in DuckDB for a full-width constant: the
    64×64 product is decomposed into 32-bit halves so no intermediate
    exceeds INT128 (a direct HUGEINT multiply overflows for c ≥ 2^63).
    Exact twin of numpy uint64 wraparound multiply (verified
    bit-identical incl. int64 max)."""
    c_lo, c_hi = c & 0xFFFFFFFF, c >> 32
    xl = f"(CAST({x} AS HUGEINT) % 4294967296)"
    xh = f"(CAST({x} AS HUGEINT) // 4294967296)"
    mid = f"(({xl} * {c_hi} + {xh} * {c_lo}) % 4294967296)"
    return (f"CAST((({xl} * {c_lo} + {mid} * 4294967296) "
            f"% 18446744073709551616) AS UBIGINT)")


def _mix64_sql_ctes(prefix: str, src: str, cols: str = "") -> str:
    """CTE chain applying the splitmix64 finalizer (the exact twin of
    ``rayindex.datapipe.sketch.mix64``) to column ``h`` of CTE ``src``,
    carrying ``cols`` through; the result lands in CTE ``{prefix}5``."""
    cc = (cols + ", ") if cols else ""
    return f"""
            {prefix}1 AS (SELECT {cc}xor(h, h >> 30) AS h FROM {src}),
            {prefix}2 AS (SELECT {cc}{_mulmod64_sql('h', 0xBF58476D1CE4E5B9)}
                          AS h FROM {prefix}1),
            {prefix}3 AS (SELECT {cc}xor(h, h >> 27) AS h FROM {prefix}2),
            {prefix}4 AS (SELECT {cc}{_mulmod64_sql('h', 0x94D049BB133111EB)}
                          AS h FROM {prefix}3),
            {prefix}5 AS (SELECT {cc}xor(h, h >> 31) AS h FROM {prefix}4)"""


def _redact_pii_sql() -> str:
    """DuckDB twin of rayindex.datapipe.text.redact_pii_batch: the SAME
    RE2 pattern strings (single source of truth), same order, global
    replacement."""
    from rayindex.datapipe.text import PII_PATTERNS

    expr = "text"
    for pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, $re${pat}$re$, '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS text FROM documents"


def _shingle_cte(shingle_k: int = 5) -> str:
    """CTE chain reproducing rayindex.datapipe.dedup._shingles in pure
    DuckDB: FNV-1a token hashes → k-token rolling shingles (uint64 Horner,
    wrap at 2^64; short docs hash their joined tokens).  Ends with ``shs``
    (doc_id, sh) — the exact per-doc shingle set."""
    k = shingle_k
    return f"""
            {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            short AS (SELECT doc_id, array_to_string(tl, ' ') AS s
                      FROM tokl WHERE len(tl) BETWEEN 1 AND {k - 1}),
            jh AS (SELECT doc_id, list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                                    list_transform(string_split(s, ''),
                                                   c -> CAST(ord(c) AS HUGEINT))),
                       (h, b) -> ((h - (h % 128)
                                   + CAST(xor(CAST(h % 128 AS BIGINT),
                                              CAST(b AS BIGINT)) AS HUGEINT))
                                  * 1099511628211) % 18446744073709551616) AS sh
                   FROM short),
            rolled AS (SELECT doc_id,
                         unnest(list_transform(range(1, len(hs) - {k - 2}),
                           j -> list_reduce(
                                  list_slice(hs, CAST(j AS INT),
                                             CAST(j + {k - 1} AS INT)),
                                  (acc, x) -> (acc * 1000003 + x)
                                              % 18446744073709551616))) AS sh
                       FROM hl WHERE len(hs) >= {k}),
            shs AS (SELECT DISTINCT doc_id, sh FROM
                    (SELECT * FROM rolled UNION ALL SELECT * FROM jh))
    """


def _minhash_cte(num_perm: int = 64, bands: int = 16, shingle_k: int = 5) -> str:
    """Shared CTE chain reproducing rayindex.datapipe.dedup's MinHash-LSH
    in pure DuckDB: the exact shingle sets (``_shingle_cte``) → 32-bit
    fold → the SEEDED universal-hash permutations (a·x+b mod 2^31−1; the
    rng-derived (a, b) constants are inlined as VALUES — data, not logic)
    → per-doc signature lists → banded candidate pairs (any of ``bands``
    equal slices).  Ends with ``cand`` (doc_a, doc_b, sa, sb) and exposes
    ``shs`` for the verification oracle."""
    from rayindex.datapipe.dedup import _minhash_params

    a, b, _ = _minhash_params(num_perm)
    perm_vals = ", ".join(f"({i}, {int(ai)}, {int(bi)})"
                          for i, (ai, bi) in enumerate(zip(a, b)))
    rows = num_perm // bands
    return f"""
            {_shingle_cte(shingle_k)},
            folded AS (SELECT doc_id,
                         xor(CAST(sh % 4294967296 AS BIGINT),
                             CAST(sh // 4294967296 AS BIGINT)) AS x
                       FROM shs),
            perms(perm, pa, pb) AS (VALUES {perm_vals}),
            minv AS (SELECT f.doc_id, p.perm,
                            min((p.pa * f.x + p.pb) % 2147483647) AS v
                     FROM folded f CROSS JOIN perms p
                     GROUP BY f.doc_id, p.perm),
            sigrows AS (
              SELECT d.doc_id, p.perm,
                     CAST(coalesce(m.v, 18446744073709551615) AS UBIGINT) AS v
              FROM (SELECT DISTINCT doc_id FROM documents) d
              CROSS JOIN perms p
              LEFT JOIN minv m ON m.doc_id = d.doc_id AND m.perm = p.perm),
            sl AS (SELECT doc_id, list(v ORDER BY perm) AS sig
                   FROM sigrows GROUP BY doc_id),
            cand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.sig AS sa, b.sig AS sb
              FROM sl a JOIN sl b ON a.doc_id < b.doc_id
              WHERE len(list_filter(range({bands}),
                    bi -> list_slice(a.sig, CAST(bi * {rows} + 1 AS INT),
                                     CAST(bi * {rows} + {rows} AS INT))
                          = list_slice(b.sig, CAST(bi * {rows} + 1 AS INT),
                                       CAST(bi * {rows} + {rows} AS INT)))) > 0)
    """


def oracle_sql() -> dict[str, str]:
    from rayindex.datapipe.text import BPE_PATTERN as _BPE_PATTERN

    probe = ", ".join(f"'{t}'" for t in PROBE_TERMS)
    qvals = ", ".join(
        f"({qid}, '{term}')"
        for qid, qtext in BM25_QUERIES
        for term in sorted(set(qtext.split()))
    )
    stop = ", ".join(f"'{s}'" for s in (
        "the", "and", "of", "a", "to", "in", "is", "it", "that", "for"))
    # cosine_neardup_lsh's seeded hyperplane matrix, inlined as exact
    # shortest-round-trip literals (repr(float) parses back to the same
    # double in DuckDB) so the sign-bit patterns reproduce exactly.
    _H = np.random.default_rng(7).standard_normal((64, 16))
    hvals = ", ".join(f"({i}, {b}, {_H[i, b]!r})"
                      for i in range(64) for b in range(16))
    d = {
        "term_stats": f"""
            WITH {_TOKS_CTE}
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf
            FROM tf GROUP BY term
        """,
        "merged_term_stats": f"""
            WITH {_TOKS_CTE}
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf
            FROM tf GROUP BY term
        """,
        "deleted_term_stats": f"""
            WITH docs AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), {TOKEN_RE_SQL}) AS toks
              FROM documents
              WHERE NOT (lang = 'de' OR doc_id % 97 = 0)),
            toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term)
            SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf
            FROM tf GROUP BY term
        """,
        "collection_stats": f"""
            WITH {_TOKS_CTE}
            SELECT count(*) AS n_docs, sum(dl)::BIGINT AS total_tokens,
                   CAST(round(sum(dl)::DOUBLE / count(*) * 1e6) AS BIGINT)
                     AS avg_dl_micro,
                   (SELECT count(*) FROM dfq) AS n_terms
            FROM dl
        """,
        "postings_probe": f"""
            WITH {_TOKS_CTE}
            SELECT term, doc_id, count(*)::BIGINT AS tf,
                   min(p)::BIGINT AS min_pos, max(p)::BIGINT AS max_pos
            FROM pos WHERE term IN ({probe})
            GROUP BY term, doc_id
        """,
        "compacted_postings_probe": f"""
            WITH docs AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), {TOKEN_RE_SQL}) AS toks
              FROM documents
              WHERE NOT (lang = 'de' OR doc_id % 97 = 0)),
            pos AS (SELECT doc_id, unnest(toks) AS term,
                           generate_subscripts(toks, 1) AS p
                    FROM docs)
            SELECT term, doc_id, count(*)::BIGINT AS tf,
                   min(p)::BIGINT AS min_pos, max(p)::BIGINT AS max_pos
            FROM pos WHERE term IN ({probe})
            GROUP BY term, doc_id
        """,
        "tombstone_postings_probe": f"""
            WITH {_TOKS_CTE}
            SELECT term, doc_id, count(*)::BIGINT AS tf,
                   min(p)::BIGINT AS min_pos, max(p)::BIGINT AS max_pos
            FROM pos WHERE term IN ({probe}) AND doc_id % 13 <> 5
            GROUP BY term, doc_id
        """,
        "tombstone_bm25_topk": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES {qvals}),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                sum( ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id)
            -- stats/df/dl stay FULL-corpus (frozen until compact);
            -- tombstoned docs are filtered only from the ranking
            , micro AS (SELECT query_id, doc_id,
                   CAST(round(s * 1e6) AS BIGINT) AS score_micro FROM scored
                   WHERE doc_id % 13 <> 5)
            SELECT query_id, doc_id, score_micro,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
            FROM micro
            QUALIFY rank <= 10
        """,
        "bm25_topk": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES {qvals}),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                sum( ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id)
            , micro AS (SELECT query_id, doc_id,
                   CAST(round(s * 1e6) AS BIGINT) AS score_micro FROM scored)
            SELECT query_id, doc_id, score_micro,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
            FROM micro
            QUALIFY rank <= 10
        """,
        "suggest_terms": f"""
            WITH {_TOKS_CTE},
            cf AS (SELECT term, sum(tf)::BIGINT AS cf FROM tf GROUP BY term)
            SELECT CAST(row_number() OVER (
                     ORDER BY cf DESC, term ASC) AS INT) AS rank, term, cf
            FROM cf WHERE term LIKE 's%'
            ORDER BY rank LIMIT 10
        """,
        "search_snippets": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES {qvals}),
            bs AS (
              SELECT q.query_id, tf.doc_id,
                sum( ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id),
            bm AS (
              SELECT query_id, doc_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY CAST(round(s * 1e6) AS BIGINT) DESC,
                                   doc_id ASC) AS INT) AS rank
              FROM bs QUALIFY rank <= 10),
            pmin AS (
              SELECT q.query_id, pos.doc_id, min(pos.p) AS p
              FROM q JOIN pos USING (term)
              GROUP BY q.query_id, pos.doc_id)
            SELECT bm.query_id, bm.doc_id,
                   array_to_string(
                     d.toks[greatest(pmin.p - 2, 1):
                            least(pmin.p + 2, len(d.toks))], ' ') AS snippet
            FROM bm JOIN pmin USING (query_id, doc_id)
                 JOIN docs d ON d.doc_id = bm.doc_id
        """,
        "facet_lang_counts": f"""
            WITH {_TOKS_CTE},
            sel AS (
              SELECT doc_id FROM tf WHERE term = 'scan'
              INTERSECT
              SELECT doc_id FROM tf WHERE term = 'customer')
            SELECT d.lang, count(*)::BIGINT AS n_docs
            FROM documents d JOIN sel USING (doc_id)
            GROUP BY d.lang
        """,
        "facet_repo_counts": f"""
            WITH {_TOKS_CTE},
            sel AS (
              SELECT doc_id FROM tf WHERE term = 'scan'
              INTERSECT
              SELECT doc_id FROM tf WHERE term = 'customer')
            SELECT d.source AS repo, count(*)::BIGINT AS n_docs
            FROM documents d JOIN sel USING (doc_id)
            GROUP BY d.source
        """,
        "sequence_pack": f"""
            WITH dl AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), {TOKEN_RE_SQL}))
                       AS n
              FROM documents),
            off AS (
              SELECT doc_id, n,
                     CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS BIGINT) AS base
              FROM dl),
            segs AS (
              SELECT doc_id, n, base,
                     unnest(generate_series(base // 128,
                                            (base + n - 1) // 128))
                       AS chunk_id
              FROM off WHERE n > 0)
            SELECT chunk_id, doc_id,
                   greatest(chunk_id * 128 - base, 0) AS tok_start,
                   least((chunk_id + 1) * 128 - base, n)
                     - greatest(chunk_id * 128 - base, 0) AS tok_len
            FROM segs
        """,
        "ranker_agreement": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES {qvals}),
            bs AS (
              SELECT q.query_id, tf.doc_id,
                sum( ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id),
            bm AS (
              SELECT query_id, doc_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY CAST(round(s * 1e6) AS BIGINT) DESC,
                                   doc_id ASC) AS INT) AS rank
              FROM bs QUALIFY rank <= 10),
            rs AS (
              SELECT q.query_id, tf.doc_id,
                sum( ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * tf.tf
                     / (1.5 * dl.dl / stats.avgdl + tf.tf + 0.5)
                   ) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id),
            rf AS (
              SELECT query_id, doc_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY CAST(round(s * 1e6) AS BIGINT) DESC,
                                   doc_id ASC) AS INT) AS rank
              FROM rs QUALIFY rank <= 10),
            base AS (
              SELECT DISTINCT query_id FROM (
                SELECT query_id FROM bm
                UNION ALL SELECT query_id FROM rf)),
            same AS (
              SELECT bm.query_id, count(*) AS c
              FROM bm JOIN rf USING (query_id, rank)
              WHERE bm.doc_id = rf.doc_id GROUP BY bm.query_id),
            ov AS (
              SELECT bm.query_id, count(*) AS c
              FROM bm JOIN rf ON bm.query_id = rf.query_id
                             AND bm.doc_id = rf.doc_id
              GROUP BY bm.query_id)
            SELECT base.query_id,
                   coalesce(same.c, 0)::BIGINT AS same_position_count,
                   coalesce(ov.c, 0)::BIGINT AS overlap_count
            FROM base LEFT JOIN same USING (query_id)
                      LEFT JOIN ov USING (query_id)
        """,
        "bm25_topk_lang": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            q(query_id, term) AS (VALUES {qvals}),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                sum( ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5))
                     * (tf.tf * 2.2)
                     / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                   ) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
              GROUP BY q.query_id, tf.doc_id)
            , micro AS (SELECT query_id, doc_id,
                   CAST(round(s * 1e6) AS BIGINT) AS score_micro FROM scored
              WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'de'))
            SELECT query_id, doc_id, score_micro,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
            FROM micro
            QUALIFY rank <= 10
        """,
        "boolean_and_docs": f"""
            WITH {_TOKS_CTE}
            SELECT doc_id FROM tf WHERE term = 'scan'
            INTERSECT
            SELECT doc_id FROM tf WHERE term = 'customer'
            ORDER BY doc_id LIMIT 500
        """,
        "boolean_or_docs": f"""
            WITH {_TOKS_CTE}
            SELECT doc_id FROM tf WHERE term = 'scan'
            UNION
            SELECT doc_id FROM tf WHERE term = 'window'
            ORDER BY doc_id LIMIT 500
        """,
        "boolean_andnot_docs": f"""
            WITH {_TOKS_CTE}
            SELECT doc_id FROM tf WHERE term = 'scan'
            EXCEPT
            SELECT doc_id FROM tf WHERE term = 'window'
            ORDER BY doc_id LIMIT 500
        """,
        "vsm_scores": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT count(*) AS n FROM dl),
            q(query_id, term) AS (VALUES {", ".join(
                f"({qid}, '{t}')" for qid, qtext in VSM_QUERIES
                for t in sorted(set(qtext.split())))}),
            qw AS (SELECT q.query_id, q.term,
                          log10(stats.n / dfq.df::DOUBLE) AS wq, dfq.df, stats.n
                   FROM q JOIN dfq USING (term) CROSS JOIN stats),
            qmag AS (SELECT query_id, sqrt(sum(wq*wq)) AS qm
                     FROM qw GROUP BY query_id),
            dw AS (SELECT qw.query_id, tf.doc_id, qw.wq,
                          CASE WHEN qw.df < qw.n
                               THEN greatest((1 + log10(tf.tf))
                                    * log10((qw.n - qw.df)::DOUBLE / qw.df), 0)
                               ELSE 0 END AS wd
                   FROM qw JOIN tf USING (term)),
            scored AS (SELECT query_id, doc_id, sum(wd*wq) AS dot,
                              sqrt(sum(wd*wd)) AS dm
                       FROM dw GROUP BY query_id, doc_id),
            micro AS (SELECT s.query_id, s.doc_id,
                           CAST(round(CASE WHEN s.dm * m.qm > 0
                                           THEN s.dot / (s.dm * m.qm)
                                           ELSE 0 END * 1e6) AS BIGINT)
                             AS score_micro
                      FROM scored s JOIN qmag m USING (query_id))
            SELECT query_id, doc_id, score_micro
            FROM micro WHERE score_micro > 0
        """,
        "lm_pyp_topk": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT sum(dl)::DOUBLE AS tot FROM dl),
            q(query_id, term) AS (VALUES {", ".join(
                f"({i}, '{t}')" for i, t in LM_QUERIES)}),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                ln((greatest(tf.tf - 0.2 * power(tf.tf, 0.2), 0) * stats.tot)
                   / (1303.0 * dfq.df) + 1)
                + ln(1 - greatest(dl.dl - 0.2 * power(dl.dl, 0.2), 0)
                     / (dl.dl + 1303.0)) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
            micro AS (SELECT query_id, doc_id,
                   CAST(round(s * 1e6) AS BIGINT) AS score_micro FROM scored)
            SELECT query_id, doc_id, score_micro,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
            FROM micro
            QUALIFY rank <= 10
        """,
        "rerank_boost": f"""
            WITH {_TOKS_CTE}
            SELECT d.doc_id,
                   CAST(round(CASE WHEN d.source = 'src3'
                                   THEN tf.tf * 1.1
                                   ELSE tf.tf * 1.0 END * 1e6) AS BIGINT)
                     AS score_micro
            FROM tf JOIN documents d USING (doc_id)
            WHERE tf.term = 'scan'
        """,
        "langid": """
            WITH toks AS (SELECT doc_id,
                                 regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            dtd AS (SELECT DISTINCT doc_id, unnest(tl) AS t FROM toks),
            profiles(lang, pri, words) AS (VALUES
              ('en', 0, ['the','and','of','to','in','is','was','for','with','that']),
              ('de', 1, ['der','die','das','und','ist','nicht','ein','mit','von','zu']),
              ('fr', 2, ['le','la','les','et','est','un','une','des','que','pour']),
              ('es', 3, ['el','la','los','las','es','un','una','que','por','para'])),
            hits AS (SELECT d.doc_id, p.lang, p.pri, count(*) AS n
                     FROM dtd d JOIN profiles p ON list_contains(p.words, d.t)
                     GROUP BY d.doc_id, p.lang, p.pri),
            best AS (SELECT doc_id, lang, n,
                            row_number() OVER (PARTITION BY doc_id
                                 ORDER BY n DESC, pri ASC) AS rn
                     FROM hits)
            SELECT d.doc_id,
                   coalesce(b.lang, 'und') AS lang_pred,
                   CAST(coalesce(b.n, 0) * 100000 AS BIGINT) AS lang_conf_micro
            FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1 AND n > 0) b
              ON d.doc_id = b.doc_id
        """,
        "fingerprint": f"""
            WITH {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs FROM th GROUP BY doc_id),
            roll AS (
              SELECT doc_id,
                CASE WHEN len(hs) = 0 THEN 0
                     WHEN len(hs) < 8 THEN
                       list_reduce(list_prepend(CAST(0 AS HUGEINT), hs),
                                   (a, x) -> (a * 1000003 + x)
                                             % 18446744073709551616)
                     ELSE
                       list_min(list_transform(range(1, len(hs) - 6),
                         i -> list_reduce(
                                list_prepend(CAST(0 AS HUGEINT),
                                             list_slice(hs, i, i + 7)),
                                (a, x) -> (a * 1000003 + x)
                                          % 18446744073709551616)))
                END AS fp
              FROM hl)
            SELECT d.doc_id, CAST(coalesce(r.fp, 0) AS UBIGINT) AS fingerprint
            FROM documents d LEFT JOIN roll r ON d.doc_id = r.doc_id
        """,
        "winnow_fingerprints": f"""
            WITH {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            grams AS (SELECT doc_id, len(hs) - 3 AS m,
                 list_transform(range(1, len(hs) - 2),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                                       list_slice(hs, i, i + 3)),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616)) AS gl
               FROM hl WHERE len(hs) >= 4),
            picks AS (SELECT doc_id, gl,
                 CASE WHEN m <= 4 THEN [list_position(gl, list_min(gl))]
                      ELSE list_distinct(list_transform(range(1, m - 2),
                        j -> j - 1 + list_position(
                               list_slice(gl, j, j + 3),
                               list_min(list_slice(gl, j, j + 3)))))
                 END AS poss
               FROM grams),
            u AS (SELECT doc_id, unnest(poss) AS p, gl FROM picks)
            SELECT doc_id, CAST(p AS BIGINT) AS pos,
                   CAST(gl[p] AS UBIGINT) AS fp
            FROM u
        """,
        "winnow_dup_stats": f"""
            WITH {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            grams AS (SELECT doc_id, len(hs) - 3 AS m,
                 list_transform(range(1, len(hs) - 2),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                                       list_slice(hs, i, i + 3)),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616)) AS gl
               FROM hl WHERE len(hs) >= 4),
            picks AS (SELECT doc_id, gl,
                 CASE WHEN m <= 4 THEN [list_position(gl, list_min(gl))]
                      ELSE list_distinct(list_transform(range(1, m - 2),
                        j -> j - 1 + list_position(
                               list_slice(gl, j, j + 3),
                               list_min(list_slice(gl, j, j + 3)))))
                 END AS poss
               FROM grams),
            f AS (SELECT doc_id, gl[p] AS fp
                  FROM (SELECT doc_id, unnest(poss) AS p, gl FROM picks)),
            c AS (SELECT fp, count(DISTINCT doc_id) AS d FROM f GROUP BY fp)
            SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_fps,
                   CAST(sum(CASE WHEN c.d > 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_dup_fps
            FROM f JOIN c USING (fp) GROUP BY f.doc_id
        """,
        "span_attribution": f"""
            WITH {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            grams AS (SELECT doc_id, len(hs) - 3 AS m,
                 list_transform(range(1, len(hs) - 2),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                                       list_slice(hs, i, i + 3)),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616)) AS gl
               FROM hl WHERE len(hs) >= 4),
            picks AS (SELECT doc_id, gl,
                 CASE WHEN m <= 4 THEN [list_position(gl, list_min(gl))]
                      ELSE list_distinct(list_transform(range(1, m - 2),
                        j -> j - 1 + list_position(
                               list_slice(gl, j, j + 3),
                               list_min(list_slice(gl, j, j + 3)))))
                 END AS poss
               FROM grams),
            f AS (SELECT DISTINCT doc_id, gl[p] AS fp
                  FROM (SELECT doc_id, unnest(poss) AS p, gl FROM picks)),
            el AS (SELECT fp FROM f GROUP BY fp
                   HAVING count(*) BETWEEN 2 AND 64),
            pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM f a JOIN f b
                     ON a.fp = b.fp AND a.doc_id < b.doc_id
                   WHERE a.fp IN (SELECT fp FROM el))
            SELECT doc_a, doc_b, count(*)::BIGINT AS n_shared_fps
            FROM pr GROUP BY doc_a, doc_b
        """,
        "dedup_substrings": f"""
            WITH {_FNV_CTE},
            tok AS (SELECT doc_id, generate_subscripts(tl, 1) AS i,
                           unnest(tl) AS tok FROM tokl),
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            gr AS (SELECT doc_id,
                 list_transform(range(1, len(hs) - 3),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                                       list_slice(hs, i, i + 4)),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616)) AS gl
               FROM hl WHERE len(hs) >= 5),
            g AS (SELECT doc_id, generate_subscripts(gl, 1) AS pos,
                         unnest(gl) AS gh FROM gr),
            dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) > 1),
            cov AS (SELECT DISTINCT g.doc_id, t.i
                    FROM g JOIN dup USING (gh)
                    JOIN tok t ON t.doc_id = g.doc_id
                               AND t.i BETWEEN g.pos AND g.pos + 4),
            kept AS (SELECT t.doc_id,
                            string_agg(t.tok, ' ' ORDER BY t.i) AS ct,
                            count(*) AS nk
                     FROM tok t LEFT JOIN cov c
                       ON t.doc_id = c.doc_id AND t.i = c.i
                     WHERE c.i IS NULL GROUP BY t.doc_id)
            SELECT d.doc_id, coalesce(k2.ct, '') AS clean_text,
                   CAST(coalesce(k2.nk, 0) AS BIGINT) AS n_kept
            FROM documents d LEFT JOIN kept k2 ON d.doc_id = k2.doc_id
        """,
        "simhash": f"""
            WITH {_FNV_CTE},
            bits AS (
              SELECT th.doc_id, b.b,
                     sum(CASE WHEN CAST((th.h // (CAST(1 AS HUGEINT)
                              << CAST(b.b AS INT))) % 2 AS INT) = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b
              GROUP BY th.doc_id, b.b),
            sig AS (SELECT doc_id,
                           sum(CASE WHEN vote > 0
                                    THEN (CAST(1 AS HUGEINT) << CAST(b AS INT))
                                    ELSE 0 END) AS s
                    FROM bits GROUP BY doc_id)
            SELECT d.doc_id, CAST(coalesce(sig.s, 0) AS UBIGINT) AS simhash
            FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id
        """,
        # exact pair semantics: with bands = t+1 the banded candidate set is
        # a pigeonhole SUPERSET of all hamming<=t pairs, so the engine's
        # banding+popcount output equals the plain all-pairs filter below
        "simhash_pairs": f"""
            WITH {_FNV_CTE},
            bits AS (
              SELECT th.doc_id, b.b,
                     sum(CASE WHEN CAST((th.h // (CAST(1 AS HUGEINT)
                              << CAST(b.b AS INT))) % 2 AS INT) = 1
                              THEN 1 ELSE -1 END) AS vote
              FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b
              GROUP BY th.doc_id, b.b),
            sig AS (SELECT doc_id,
                           sum(CASE WHEN vote > 0
                                    THEN (CAST(1 AS HUGEINT) << CAST(b AS INT))
                                    ELSE 0 END) AS s
                    FROM bits GROUP BY doc_id),
            s2 AS (SELECT d.doc_id,
                          CAST(coalesce(sig.s, 0) AS UBIGINT) AS s
                   FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
            FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 8
        """,
        "phrase_match_docs": f"""
            WITH {_TOKS_CTE}
            SELECT DISTINCT a.doc_id AS doc_id
            FROM pos a JOIN pos b
              ON a.doc_id = b.doc_id AND b.p = a.p + 1
            WHERE a.term = 'table' AND b.term = 'scan'
            ORDER BY doc_id
        """,
        "proximity_docs": f"""
            WITH {_TOKS_CTE}
            SELECT DISTINCT a.doc_id AS doc_id
            FROM pos a JOIN pos b ON a.doc_id = b.doc_id
            WHERE a.term = 'spark' AND b.term = 'customer'
              AND abs(a.p - b.p) <= 3
            ORDER BY doc_id
        """,
        "lm_topk": f"""
            WITH {_TOKS_CTE},
            stats AS (SELECT sum(dl)::DOUBLE AS tot FROM dl),
            q(query_id, term) AS (VALUES {", ".join(f"({i}, '{t}')" for i, t in LM_QUERIES)}),
            scored AS (
              SELECT q.query_id, tf.doc_id,
                ln(1089.0 / (dl.dl + 1089.0))
                + ln((tf.tf / 1089.0) * (stats.tot / dfq.df) + 1) AS s
              FROM q JOIN tf USING (term) JOIN dfq USING (term)
                   JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
            , micro AS (SELECT query_id, doc_id,
                   CAST(round(s * 1e6) AS BIGINT) AS score_micro FROM scored)
            SELECT query_id, doc_id, score_micro,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score_micro DESC, doc_id ASC) AS INT) AS rank
            FROM micro
            QUALIFY rank <= 10
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(round(list_cosine_similarity(
                        CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])) * 1e6) AS BIGINT)
                     AS cos_sim_micro
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
        "token_count": f"""
            WITH {_TOKS_CTE}
            SELECT d.doc_id, dl.dl::BIGINT AS n_tokens,
                   length(d.text)::BIGINT AS n_chars
            FROM documents d JOIN dl ON d.doc_id = dl.doc_id
        """,
        "quality": f"""
            WITH {_TOKS_CTE},
            agg AS (
              SELECT doc_id,
                     count(*)::BIGINT AS n_tokens,
                     sum(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END) AS n_stop,
                     sum(length(term)) AS sum_len
              FROM toks GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(agg.n_tokens, 0) AS n_tokens,
                   CAST(round(coalesce(agg.n_stop / agg.n_tokens::DOUBLE, 0) * 1e6)
                        AS BIGINT) AS stopword_ratio_micro,
                   len(regexp_extract_all(d.text, '[0-9]'))::BIGINT AS digit_count,
                   CAST(round(coalesce(agg.sum_len / agg.n_tokens::DOUBLE, 0) * 1e6)
                        AS BIGINT) AS avg_token_len_micro
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """,
        "top_bigrams": """
            WITH tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            tok AS (SELECT doc_id, generate_subscripts(tl, 1) AS i,
                           unnest(tl) AS t FROM tokl),
            bg AS (SELECT a.doc_id, a.t AS w1, b.t AS w2
                   FROM tok a JOIN tok b
                     ON b.doc_id = a.doc_id AND b.i = a.i + 1)
            SELECT w1, w2, count(*)::BIGINT AS c FROM bg
            GROUP BY w1, w2
            ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 20
        """,
        "chunk_documents": """
            WITH tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            j AS (SELECT doc_id, tl, len(tl) AS n,
                         CASE WHEN len(tl) > 64
                              THEN (len(tl) - 64 + 47) // 48
                              ELSE 0 END AS jmax
                  FROM tokl WHERE len(tl) > 0),
            c AS (SELECT doc_id, tl, n, unnest(range(0, jmax + 1)) AS cid
                  FROM j)
            SELECT doc_id,
                   CAST(cid AS BIGINT) AS chunk_id,
                   CAST(cid * 48 AS BIGINT) AS start_tok,
                   CAST(least(64, n - cid * 48) AS BIGINT) AS n_tokens,
                   array_to_string(
                     list_slice(tl, cid * 48 + 1,
                                least(cid * 48 + 64, n)), ' ') AS chunk_text
            FROM c
        """,
        "curate": f"""
            WITH tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            ln AS (
              SELECT doc_id, trim(l, ' ' || chr(9) || chr(13)) AS line
              FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                    FROM documents)),
            lg AS (SELECT doc_id, line, count(*) AS c
                   FROM ln WHERE length(line) > 0 GROUP BY doc_id, line),
            la AS (SELECT doc_id, sum(c) AS n_lines,
                          sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ
                   FROM lg GROUP BY doc_id),
            tok AS (SELECT doc_id, unnest(tl) AS t FROM tokl),
            tc AS (SELECT doc_id, sum(length(t)) AS tt FROM tok
                   GROUP BY doc_id),
            g2 AS (SELECT doc_id, unnest(gl) AS gram
                   FROM (SELECT doc_id,
                                list_transform(range(1, len(tl)), i ->
                                  array_to_string(list_slice(tl, i, i + 1),
                                                  ' ')) AS gl
                         FROM tokl WHERE len(tl) >= 2)),
            g2c AS (SELECT doc_id, gram, count(*) AS c FROM g2
                    GROUP BY doc_id, gram),
            t2 AS (SELECT doc_id,
                          max(CASE WHEN c >= 2
                                   THEN c * (length(gram) - 1)
                                   ELSE 0 END) AS top2
                   FROM g2c GROUP BY doc_id),
            {_FNV_CTE.replace('tokl AS', 'tokl_f AS').replace(
                'FROM tokl', 'FROM tokl_f')},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            gr AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(hs) - 3),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                                       list_slice(hs, i, i + 4)),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616))) AS gl
               FROM hl WHERE len(hs) >= 5),
            g AS (SELECT doc_id, unnest(gl) AS gh FROM gr),
            bg AS (SELECT DISTINCT gh FROM g WHERE doc_id < 25),
            m AS (SELECT g.doc_id, count(*) AS nm FROM g
                  JOIN bg USING (gh) GROUP BY g.doc_id),
            keep AS (
              SELECT d.doc_id, d.text, len(tokl.tl) AS n_tokens
              FROM documents d
              JOIN tokl ON d.doc_id = tokl.doc_id
              LEFT JOIN la ON d.doc_id = la.doc_id
              LEFT JOIN t2 ON d.doc_id = t2.doc_id
              LEFT JOIN tc ON d.doc_id = tc.doc_id
              LEFT JOIN m ON d.doc_id = m.doc_id
              WHERE len(tokl.tl) >= 5
                AND coalesce(la.dup_occ / la.n_lines::DOUBLE, 0) <= 0.30
                AND coalesce(t2.top2 / tc.tt::DOUBLE, 0) <= 0.25
                AND coalesce(m.nm, 0) = 0)
            SELECT min(doc_id)::BIGINT AS doc_id,
                   min(n_tokens)::BIGINT AS n_tokens,
                   count(*)::BIGINT AS n_dups
            FROM keep GROUP BY text
        """,
        "tfidf_topk": """
            WITH tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            tok AS (SELECT doc_id, unnest(tl) AS t FROM tokl),
            tf AS (SELECT doc_id, t AS term, count(*) AS tf
                   FROM tok GROUP BY doc_id, t),
            df AS (SELECT term, count(*) AS df FROM
                     (SELECT DISTINCT doc_id, t AS term FROM tok)
                   GROUP BY term),
            n AS (SELECT count(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.term,
                         tf.tf * (ln((n.n + 1) / (df.df + 1)) + 1) AS score
                  FROM tf JOIN df USING (term) CROSS JOIN n),
            r AS (SELECT doc_id, term, score,
                         row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term ASC) AS rank
                  FROM s)
            SELECT doc_id, CAST(rank AS INT) AS rank, term,
                   CAST(round(score * 1e6) AS BIGINT) AS score_micro
            FROM r WHERE rank <= 5
        """,
        "decontaminate": f"""
            WITH {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            gr AS (SELECT doc_id,
                 list_distinct(list_transform(range(1, len(hs) - 3),
                   i -> list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                                       list_slice(hs, i, i + 4)),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616))) AS gl
               FROM hl WHERE len(hs) >= 5),
            g AS (SELECT doc_id, unnest(gl) AS gh FROM gr),
            bg AS (SELECT DISTINCT gh FROM g WHERE doc_id < 25),
            m AS (SELECT g.doc_id, count(*) AS nm FROM g
                  JOIN bg USING (gh) GROUP BY g.doc_id),
            tot AS (SELECT doc_id, len(gl) AS ng FROM gr)
            SELECT d.doc_id,
                   coalesce(tot.ng, 0)::BIGINT AS n_grams,
                   coalesce(m.nm, 0)::BIGINT AS n_matched,
                   CAST(CASE WHEN coalesce(m.nm, 0) > 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS contaminated
            FROM documents d
            LEFT JOIN tot ON d.doc_id = tot.doc_id
            LEFT JOIN m ON d.doc_id = m.doc_id
        """,
        "lm_xent": """
            WITH tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            tok AS (SELECT doc_id, generate_subscripts(tl, 1) AS i,
                           unnest(tl) AS t FROM tokl),
            bg AS (SELECT a.doc_id, a.t AS w1, b.t AS w2
                   FROM tok a JOIN tok b
                     ON b.doc_id = a.doc_id AND b.i = a.i + 1),
            bc AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
            cx AS (SELECT w1, sum(c) AS c FROM bc GROUP BY w1),
            vv AS (SELECT count(*) AS v FROM
                     (SELECT w1 AS w FROM bc UNION SELECT w2 FROM bc)),
            sc AS (SELECT bg.doc_id,
                          ln((bc.c + 0.1) / (cx.c + 0.1 * vv.v)) AS lp
                   FROM bg JOIN bc USING (w1, w2) JOIN cx USING (w1)
                   CROSS JOIN vv),
            agg AS (SELECT doc_id, count(*) AS m, sum(lp) AS s
                    FROM sc GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(agg.m, 0)::BIGINT AS n_bigrams,
                   CAST(round(coalesce(-agg.s / agg.m, 0) * 1e6) AS BIGINT)
                     AS xent_micro
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        """,
        "perplexity_buckets": """
            WITH tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                          FROM documents),
            tok AS (SELECT doc_id, generate_subscripts(tl, 1) AS i,
                           unnest(tl) AS t FROM tokl),
            bg AS (SELECT a.doc_id, a.t AS w1, b.t AS w2
                   FROM tok a JOIN tok b
                     ON b.doc_id = a.doc_id AND b.i = a.i + 1),
            bc AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
            cx AS (SELECT w1, sum(c) AS c FROM bc GROUP BY w1),
            vv AS (SELECT count(*) AS v FROM
                     (SELECT w1 AS w FROM bc UNION SELECT w2 FROM bc)),
            sc AS (SELECT bg.doc_id,
                          ln((bc.c + 0.1) / (cx.c + 0.1 * vv.v)) AS lp
                   FROM bg JOIN bc USING (w1, w2) JOIN cx USING (w1)
                   CROSS JOIN vv),
            agg AS (SELECT doc_id, count(*) AS m, sum(lp) AS s
                    FROM sc GROUP BY doc_id),
            mic AS (SELECT d.doc_id,
                           CAST(round(coalesce(-agg.s / agg.m, 0) * 1e6)
                                AS BIGINT) AS xm
                    FROM documents d
                    LEFT JOIN agg ON d.doc_id = agg.doc_id),
            cuts AS (SELECT quantile_disc(xm, 1.0/3) AS c1,
                            quantile_disc(xm, 2.0/3) AS c2 FROM mic)
            SELECT doc_id, xm AS xent_micro,
                   CAST(CASE WHEN xm > c2 THEN 2
                             WHEN xm > c1 THEN 1
                             ELSE 0 END AS INT) AS bucket
            FROM mic, cuts
        """,
        "semdedup": """
            WITH RECURSIVE
            e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings),
            c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
                   FROM e ORDER BY vec_id LIMIT 4),
            a0 AS (SELECT vec_id, cid FROM (
                     SELECT e.vec_id, c0.cid,
                            row_number() OVER (
                              PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c0.v) ASC,
                                       c0.cid ASC) AS rn
                     FROM e CROSS JOIN c0) WHERE rn = 1),
            ex AS (SELECT vec_id, generate_subscripts(v, 1) AS dim,
                          unnest(v) AS val FROM e),
            m1 AS (SELECT a0.cid, ex.dim, avg(ex.val) AS av
                   FROM a0 JOIN ex USING (vec_id) GROUP BY a0.cid, ex.dim),
            cm AS (SELECT cid, list(av ORDER BY dim) AS v FROM m1
                   GROUP BY cid),
            c1 AS (SELECT c0.cid, coalesce(cm.v, c0.v) AS v
                   FROM c0 LEFT JOIN cm USING (cid)),
            a1 AS (SELECT vec_id, cid FROM (
                     SELECT e.vec_id, c1.cid,
                            row_number() OVER (
                              PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c1.v) ASC,
                                       c1.cid ASC) AS rn
                     FROM e CROSS JOIN c1) WHERE rn = 1),
            jp AS (SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
                   FROM a1 x JOIN a1 y ON y.cid = x.cid
                                      AND y.vec_id > x.vec_id
                   JOIN e ea ON ea.vec_id = x.vec_id
                   JOIN e eb ON eb.vec_id = y.vec_id
                   WHERE list_cosine_similarity(ea.v, eb.v) >= 0.4),
            ed AS (SELECT doc_a AS u, doc_b AS v FROM jp
                   UNION SELECT doc_b, doc_a FROM jp),
            walk(node, comp) AS (
                SELECT u, u FROM ed
                UNION
                SELECT w.node, ed.v FROM walk w JOIN ed ON ed.u = w.comp
            ),
            cc AS (SELECT node, min(comp) AS comp FROM walk GROUP BY node)
            SELECT a1.vec_id, CAST(a1.cid AS INT) AS cluster,
                   coalesce(cc.comp, a1.vec_id)::BIGINT AS comp,
                   CAST(CASE WHEN coalesce(cc.comp, a1.vec_id) = a1.vec_id
                             THEN 1 ELSE 0 END AS INT) AS keep
            FROM a1 LEFT JOIN cc ON cc.node = a1.vec_id
        """,
        "cdc_chunks": f"""
            WITH {_FNV_CTE},
            hl AS (SELECT doc_id, list(h ORDER BY i) AS hs
                   FROM th GROUP BY doc_id),
            wd AS (SELECT doc_id, hs, len(hs) AS n FROM hl
                   WHERE len(hs) > 0),
            gr AS (SELECT doc_id, hs, n,
                     CASE WHEN n >= 4 THEN list_transform(range(1, n - 2),
                       j -> list_reduce(
                              list_prepend(CAST(0 AS HUGEINT),
                                list_slice(hs, CAST(j AS INT),
                                           CAST(j + 3 AS INT))),
                              (a, x) -> (a * 1000003 + x)
                                        % 18446744073709551616))
                          ELSE [] END AS gl
                   FROM wd),
            ends AS (SELECT doc_id, hs, n, list_concat(
                       list_filter(list_transform(range(1, len(gl) + 1),
                         j -> CASE WHEN gl[j] % 64 = 0 AND j + 3 < n
                                   THEN j + 3 ELSE NULL END),
                         x -> x IS NOT NULL), [n]) AS el
                     FROM gr),
            ch AS (SELECT doc_id, CAST(ci - 1 AS INT) AS chunk_idx,
                          CASE WHEN ci = 1 THEN 1
                               ELSE el[ci - 1] + 1 END AS st,
                          el[ci] AS en, hs
                   FROM (SELECT doc_id, hs, el,
                                generate_subscripts(el, 1) AS ci
                         FROM ends))
            SELECT doc_id, chunk_idx, CAST(st AS BIGINT) AS start_tok,
                   CAST(en - st + 1 AS BIGINT) AS n_tokens,
                   CAST(list_reduce(
                          list_prepend(CAST(0 AS HUGEINT),
                            list_slice(hs, CAST(st AS INT),
                                       CAST(en AS INT))),
                          (a, x) -> (a * 1000003 + x)
                                    % 18446744073709551616) AS UBIGINT)
                     AS chunk_hash
            FROM ch
        """,
        "repetition": """
            WITH ln AS (
              SELECT doc_id, trim(l, ' ' || chr(9) || chr(13)) AS line
              FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                    FROM documents)),
            lg AS (SELECT doc_id, line, count(*) AS c, length(line) AS lc
                   FROM ln WHERE length(line) > 0 GROUP BY doc_id, line),
            la AS (SELECT doc_id, sum(c) AS n_lines,
                          sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dup_occ,
                          sum(c * lc) AS tot_lc,
                          sum(CASE WHEN c >= 2 THEN c * lc ELSE 0 END) AS dup_lc
                   FROM lg GROUP BY doc_id),
            tokl AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
                     FROM documents),
            tok AS (SELECT doc_id, generate_subscripts(tl, 1) AS i,
                           unnest(tl) AS t FROM tokl),
            tc AS (SELECT doc_id, sum(length(t)) AS tt FROM tok
                   GROUP BY doc_id),
            g2 AS (SELECT doc_id, unnest(gl) AS gram
                   FROM (SELECT doc_id,
                                list_transform(range(1, len(tl)), i ->
                                  array_to_string(list_slice(tl, i, i + 1),
                                                  ' ')) AS gl
                         FROM tokl WHERE len(tl) >= 2)),
            g2c AS (SELECT doc_id, gram, count(*) AS c FROM g2
                    GROUP BY doc_id, gram),
            t2 AS (SELECT doc_id,
                          max(CASE WHEN c >= 2
                                   THEN c * (length(gram) - 1)
                                   ELSE 0 END) AS top2
                   FROM g2c GROUP BY doc_id),
            g5 AS (SELECT doc_id, generate_subscripts(gl, 1) AS p,
                          unnest(gl) AS gram
                   FROM (SELECT doc_id,
                                list_transform(range(1, len(tl) - 3), i ->
                                  array_to_string(list_slice(tl, i, i + 4),
                                                  ' ')) AS gl
                         FROM tokl WHERE len(tl) >= 5)),
            dupg AS (SELECT doc_id, gram FROM g5 GROUP BY doc_id, gram
                     HAVING count(*) >= 2),
            cov AS (SELECT DISTINCT t.doc_id, t.i, length(t.t) AS lt
                    FROM g5 JOIN dupg USING (doc_id, gram)
                    JOIN tok t ON t.doc_id = g5.doc_id
                               AND t.i BETWEEN g5.p AND g5.p + 4),
            cc AS (SELECT doc_id, sum(lt) AS covc FROM cov GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(la.n_lines, 0)::BIGINT AS n_lines,
                   CAST(round(coalesce(la.dup_occ / la.n_lines::DOUBLE, 0)
                              * 1e6) AS BIGINT) AS dup_line_frac_micro,
                   CAST(round(coalesce(la.dup_lc / la.tot_lc::DOUBLE, 0)
                              * 1e6) AS BIGINT) AS dup_line_char_frac_micro,
                   CAST(round(coalesce(t2.top2 / tc.tt::DOUBLE, 0)
                              * 1e6) AS BIGINT) AS top_2gram_char_frac_micro,
                   CAST(round(coalesce(cc.covc / tc.tt::DOUBLE, 0)
                              * 1e6) AS BIGINT) AS dup_5gram_char_frac_micro
            FROM documents d
            LEFT JOIN la ON d.doc_id = la.doc_id
            LEFT JOIN tc ON d.doc_id = tc.doc_id
            LEFT JOIN t2 ON d.doc_id = t2.doc_id
            LEFT JOIN cc ON d.doc_id = cc.doc_id
        """,
        "exact_dedup": """
            SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_dups
            FROM documents GROUP BY text
        """,
        "kmeans_clusters": """
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
                   FROM e ORDER BY vec_id LIMIT 4),
            a0 AS (SELECT vec_id, cid FROM (
                     SELECT e.vec_id, c0.cid,
                            row_number() OVER (
                              PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c0.v) ASC,
                                       c0.cid ASC) AS rn
                     FROM e CROSS JOIN c0) WHERE rn = 1),
            ex AS (SELECT vec_id, generate_subscripts(v, 1) AS dim,
                          unnest(v) AS val FROM e),
            m1 AS (SELECT a0.cid, ex.dim, avg(ex.val) AS av
                   FROM a0 JOIN ex USING (vec_id) GROUP BY a0.cid, ex.dim),
            cm AS (SELECT cid, list(av ORDER BY dim) AS v FROM m1
                   GROUP BY cid),
            c1 AS (SELECT c0.cid, coalesce(cm.v, c0.v) AS v
                   FROM c0 LEFT JOIN cm USING (cid)),
            a1 AS (SELECT vec_id, cid FROM (
                     SELECT e.vec_id, c1.cid,
                            row_number() OVER (
                              PARTITION BY e.vec_id
                              ORDER BY list_distance(e.v, c1.v) ASC,
                                       c1.cid ASC) AS rn
                     FROM e CROSS JOIN c1) WHERE rn = 1)
            SELECT vec_id, CAST(cid AS INT) AS cluster FROM a1
        """,
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id,
                              CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 8),
            sims AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS s
              FROM q CROSS JOIN embeddings e)
            SELECT query_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY s DESC, vec_id ASC) AS INT) AS rank,
                   vec_id, CAST(round(s * 1e6) AS BIGINT) AS cos_sim_micro
            FROM sims
            QUALIFY rank <= 5
        """,
        # The three lattice-fixture ANN twins share the same quantizer
        # CTE (ex): xq = floor(8x + 0.5) — float-exact scaling, then
        # integer-only arithmetic, so every argmin/sum reproduces the
        # Ray kernels bit-for-bit in any evaluation order.
        "knn_pq": """
            WITH ex AS (
              SELECT vec_id, CAST(x.i AS INT) AS i,
                     floor(CAST(x.e AS DOUBLE) * 8 + 0.5) AS xq
              FROM (SELECT vec_id, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings) x),
            sub AS (SELECT vec_id, (i - 1) // 8 AS s,
                           sum(xq * xq) AS s2, sum(xq) AS s1
                    FROM ex GROUP BY vec_id, (i - 1) // 8),
            lat AS (SELECT CAST(j AS INT) AS j,
                           CAST(j - 8 AS DOUBLE) AS v FROM range(16) t(j)),
            enc AS (SELECT vec_id, s, j FROM (
                SELECT a.vec_id, a.s, l.j,
                       row_number() OVER (PARTITION BY a.vec_id, a.s
                           ORDER BY a.s2 - 2 * l.v * a.s1 + 8 * l.v * l.v
                                    ASC, l.j ASC) AS rn
                FROM sub a CROSS JOIN lat l) WHERE rn = 1),
            qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
            qlut AS (SELECT a.vec_id AS query_id, a.s, l.j,
                            a.s2 - 2 * l.v * a.s1 + 8 * l.v * l.v AS qd
                     FROM sub a CROSS JOIN lat l
                     WHERE a.vec_id IN (SELECT vec_id FROM qids)),
            adc AS (SELECT ql.query_id, c.vec_id, sum(ql.qd) AS dist
                    FROM enc c JOIN qlut ql ON ql.s = c.s AND ql.j = c.j
                    GROUP BY ql.query_id, c.vec_id)
            SELECT query_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY dist ASC, vec_id ASC) AS INT) AS rank,
                   vec_id, CAST(round(dist * 1e6) AS BIGINT) AS adc_dist_micro
            FROM adc QUALIFY rank <= 5
        """,
        "knn_ivf": """
            WITH ex AS (
              SELECT vec_id, CAST(x.i AS INT) AS i,
                     floor(CAST(x.e AS DOUBLE) * 8 + 0.5) AS xq
              FROM (SELECT vec_id, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings) x),
            cidx AS (SELECT vec_id,
                            CAST(row_number() OVER (ORDER BY vec_id) - 1
                                 AS INT) AS cid
                     FROM (SELECT vec_id FROM embeddings
                           ORDER BY vec_id LIMIT 8)),
            cex AS (SELECT c.cid, e.i, e.xq AS cq
                    FROM cidx c JOIN ex e ON e.vec_id = c.vec_id),
            dots AS (SELECT e.vec_id, c.cid, sum(e.xq * c.cq) AS dp
                     FROM ex e JOIN cex c ON c.i = e.i
                     GROUP BY e.vec_id, c.cid),
            assign AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                            ORDER BY dp DESC, cid ASC) AS rn
                 FROM dots) WHERE rn = 1),
            qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
            probe AS (SELECT vec_id AS query_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                            ORDER BY dp DESC, cid ASC) AS rn
                 FROM dots WHERE vec_id IN (SELECT vec_id FROM qids))
                 WHERE rn <= 3),
            cand AS (SELECT p.query_id, a.vec_id
                     FROM probe p JOIN assign a ON a.cid = p.cid),
            score AS (SELECT cd.query_id, cd.vec_id,
                             sum(eq.xq * ev.xq) AS s
                      FROM cand cd
                      JOIN ex eq ON eq.vec_id = cd.query_id
                      JOIN ex ev ON ev.vec_id = cd.vec_id
                                AND ev.i = eq.i
                      GROUP BY cd.query_id, cd.vec_id)
            SELECT query_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY s DESC, vec_id ASC) AS INT) AS rank,
                   vec_id, CAST(round(s * 1e6) AS BIGINT) AS cos_sim_micro
            FROM score QUALIFY rank <= 5
        """,
        "knn_ivfpq": """
            WITH ex AS (
              SELECT vec_id, CAST(x.i AS INT) AS i,
                     floor(CAST(x.e AS DOUBLE) * 8 + 0.5) AS xq
              FROM (SELECT vec_id, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings) x),
            cidx AS (SELECT vec_id,
                            CAST(row_number() OVER (ORDER BY vec_id) - 1
                                 AS INT) AS cid
                     FROM (SELECT vec_id FROM embeddings
                           ORDER BY vec_id LIMIT 8)),
            cex AS (SELECT c.cid, e.i, e.xq AS cq
                    FROM cidx c JOIN ex e ON e.vec_id = c.vec_id),
            dots AS (SELECT e.vec_id, c.cid, sum(e.xq * c.cq) AS dp
                     FROM ex e JOIN cex c ON c.i = e.i
                     GROUP BY e.vec_id, c.cid),
            v2 AS (SELECT vec_id, sum(xq * xq) AS s2 FROM ex
                   GROUP BY vec_id),
            c2 AS (SELECT cid, sum(cq * cq) AS s2 FROM cex GROUP BY cid),
            d2 AS (SELECT d.vec_id, d.cid,
                          v2.s2 - 2 * d.dp + c2.s2 AS dd
                   FROM dots d JOIN v2 ON v2.vec_id = d.vec_id
                   JOIN c2 ON c2.cid = d.cid),
            assign AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                            ORDER BY dd ASC, cid ASC) AS rn
                 FROM d2) WHERE rn = 1),
            qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4),
            probe AS (SELECT vec_id AS query_id, cid FROM (
                 SELECT vec_id, cid,
                        row_number() OVER (PARTITION BY vec_id
                            ORDER BY dd ASC, cid ASC) AS rn
                 FROM d2 WHERE vec_id IN (SELECT vec_id FROM qids))
                 WHERE rn <= 3),
            res AS (SELECT e.vec_id, e.i, e.xq - c.cq AS r
                    FROM ex e JOIN assign a ON a.vec_id = e.vec_id
                    JOIN cex c ON c.cid = a.cid AND c.i = e.i),
            rsub AS (SELECT vec_id, (i - 1) // 8 AS s,
                            sum(r * r) AS s2, sum(r) AS s1
                     FROM res GROUP BY vec_id, (i - 1) // 8),
            lat AS (SELECT CAST(j AS INT) AS j,
                           CAST(j - 8 AS DOUBLE) AS v FROM range(16) t(j)),
            enc AS (SELECT vec_id, s, j FROM (
                SELECT a.vec_id, a.s, l.j,
                       row_number() OVER (PARTITION BY a.vec_id, a.s
                           ORDER BY a.s2 - 2 * l.v * a.s1 + 8 * l.v * l.v
                                    ASC, l.j ASC) AS rn
                FROM rsub a CROSS JOIN lat l) WHERE rn = 1),
            qres AS (SELECT p.query_id, p.cid, e.i, e.xq - c.cq AS r
                     FROM probe p JOIN ex e ON e.vec_id = p.query_id
                     JOIN cex c ON c.cid = p.cid AND c.i = e.i),
            qsub AS (SELECT query_id, cid, (i - 1) // 8 AS s,
                            sum(r * r) AS s2, sum(r) AS s1
                     FROM qres GROUP BY query_id, cid, (i - 1) // 8),
            qlut AS (SELECT query_id, cid, s, l.j,
                            s2 - 2 * l.v * s1 + 8 * l.v * l.v AS qd
                     FROM qsub CROSS JOIN lat l),
            adc AS (SELECT ql.query_id, en.vec_id, sum(ql.qd) AS dist
                    FROM enc en
                    JOIN assign a ON a.vec_id = en.vec_id
                    JOIN qlut ql ON ql.cid = a.cid AND ql.s = en.s
                               AND ql.j = en.j
                    GROUP BY ql.query_id, en.vec_id)
            SELECT query_id,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY dist ASC, vec_id ASC) AS INT) AS rank,
                   vec_id, CAST(round(dist * 1e6) AS BIGINT) AS adc_dist_micro
            FROM adc QUALIFY rank <= 5
        """,
        "embedding_neardup_lsh": f"""
            WITH h AS (SELECT * FROM (VALUES {hvals}) t(i, b, v)),
            e AS (SELECT vec_id, CAST(x.i AS INT) AS i,
                         CAST(x.e AS DOUBLE) AS xv
                  FROM (SELECT vec_id, unnest(embedding) AS e,
                               generate_subscripts(embedding, 1) AS i
                        FROM embeddings) x),
            -- sign(x·h) == sign(x̂·h): normalization never flips a bit
            bits AS (SELECT e.vec_id, h.b,
                            CASE WHEN sum(e.xv * h.v) >= 0
                                 THEN 1 ELSE 0 END AS bit
                     FROM e JOIN h ON h.i = e.i - 1
                     GROUP BY e.vec_id, h.b),
            pats AS (SELECT vec_id, b // 2 AS band,
                            sum(bit * CASE WHEN b % 2 = 0
                                           THEN 2 ELSE 1 END) AS pattern
                     FROM bits GROUP BY vec_id, b // 2),
            cand AS (SELECT DISTINCT a.vec_id AS id_a, bb.vec_id AS id_b
                     FROM pats a JOIN pats bb
                       ON a.band = bb.band AND a.pattern = bb.pattern
                      AND a.vec_id < bb.vec_id),
            sims AS (SELECT c.id_a, c.id_b,
                            list_cosine_similarity(
                              CAST(ea.embedding AS DOUBLE[]),
                              CAST(eb.embedding AS DOUBLE[])) AS s
                     FROM cand c
                     JOIN embeddings ea ON ea.vec_id = c.id_a
                     JOIN embeddings eb ON eb.vec_id = c.id_b)
            SELECT id_a, id_b, CAST(round(s * 1e6) AS BIGINT) AS cos_sim_micro
            FROM sims WHERE s >= 0.4
        """,
        "events_window": """
            SELECT user_id,
                   (epoch_us(ts) // 3600000000) * 3600 AS window_start,
                   count(*)::BIGINT AS n_events,
                   CAST(round(sum(value) * 1e6) AS BIGINT) AS sum_value_micro,
                   CAST(round(min(value) * 1e6) AS BIGINT) AS min_value_micro,
                   CAST(round(max(value) * 1e6) AS BIGINT) AS max_value_micro
            FROM events GROUP BY user_id, window_start
        """,
        "sessionize": """
            WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS t FROM events),
            o AS (SELECT user_id, t,
                         lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt
                  FROM e),
            m AS (SELECT user_id, t,
                         CASE WHEN pt IS NULL OR t - pt > 1800 THEN 1 ELSE 0 END AS nw
                  FROM o),
            s AS (SELECT user_id, t,
                         sum(nw) OVER (PARTITION BY user_id ORDER BY t
                                       ROWS UNBOUNDED PRECEDING) AS sid
                  FROM m)
            SELECT user_id, min(t)::BIGINT AS session_start,
                   max(t)::BIGINT AS session_end, count(*)::BIGINT AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "media_meta": """
            SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                   sha256(text) AS payload_sha256
            FROM documents
        """,
        # the sink round-trips documents metadata through the DB; a bare
        # projection is the whole contract
        "db_metadata": """
            SELECT doc_id, lang, source, n_chars FROM documents
        """,
        # same doc_id-derived probe strings; drop-invalid = try_strptime NULL
        "date_parse": """
            WITH d AS (SELECT doc_id,
                   CASE WHEN doc_id % 7 = 3 THEN 'bad' || CAST(doc_id AS VARCHAR)
                        ELSE printf('%04d%02d%02d', 2000 + doc_id % 30,
                                    1 + doc_id % 12, 1 + doc_id % 28) END AS ds
                 FROM documents),
            p AS (SELECT doc_id, try_strptime(ds, '%Y%m%d') AS ts FROM d)
            SELECT doc_id, CAST(epoch(ts) AS BIGINT) // 86400 AS epoch_day
            FROM p WHERE ts IS NOT NULL
        """,
        # the decoded expectation built directly: any decode error mismatches
        "html_unescape": """
            SELECT doc_id,
                   '<p id="&lt;x&gt;"> ' || text || ' &tail ''end''' AS text
            FROM documents
        """,
        # same vocabulary (ascii tokens + cf), same probe derivation
        # (substr surgery on the top-8 cf terms), same correction rule
        # (known -> verbatim; else damerau_levenshtein=1 best by cf desc,
        # term asc; else =2; else probe)
        "spellcheck": f"""
            WITH {_TOKS_CTE},
            vocab AS (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY term),
            top8 AS (SELECT term FROM vocab WHERE length(term) >= 6
                     ORDER BY cf DESC, term LIMIT 8),
            probes AS (
                SELECT substr(term, 1, 2) || substr(term, 4) AS probe FROM top8
                UNION ALL
                SELECT substr(term, 1, 2) || substr(term, 4, 1)
                       || substr(term, 3, 1) || substr(term, 5) FROM top8
                UNION ALL
                SELECT substr(term, 1, 2) || 'q' || substr(term, 4) FROM top8
                UNION ALL
                SELECT substr(term, 1, 3) || 'x' || substr(term, 4) FROM top8
                UNION ALL
                SELECT 'zzqqzzqq'
            )
            SELECT p.probe,
                   CASE WHEN EXISTS (SELECT 1 FROM vocab v WHERE v.term = p.probe)
                        THEN p.probe
                        ELSE coalesce(
                            (SELECT v.term FROM vocab v
                             WHERE damerau_levenshtein(p.probe, v.term) = 1
                             ORDER BY v.cf DESC, v.term LIMIT 1),
                            (SELECT v.term FROM vocab v
                             WHERE damerau_levenshtein(p.probe, v.term) = 2
                             ORDER BY v.cf DESC, v.term LIMIT 1),
                            p.probe) END AS corrected
            FROM probes p
        """,
        # est_jaccard = (# equal signature positions)/64 — an exact dyadic
        # rational, so the double hashes identically across engines
        "minhash_pairs": f"""
            WITH {_minhash_cte()}
            SELECT doc_a, doc_b,
                   len(list_filter(range(64),
                       i -> sa[CAST(i + 1 AS INT)] = sb[CAST(i + 1 AS INT)]))
                     / 64.0 AS est_jaccard
            FROM cand
        """,
        "neardup_verified": f"""
            WITH {_minhash_cte()},
            cnt AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
            inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
                      FROM cand c JOIN shs x ON x.doc_id = c.doc_a
                                  JOIN shs y ON y.doc_id = c.doc_b
                                            AND y.sh = x.sh
                      GROUP BY c.doc_a, c.doc_b),
            j AS (SELECT c.doc_a, c.doc_b,
                         coalesce(i.i, 0) AS i,
                         coalesce(ca.n, 0) + coalesce(cb.n, 0)
                           - coalesce(i.i, 0) AS u
                  FROM cand c
                  LEFT JOIN cnt ca ON ca.doc_id = c.doc_a
                  LEFT JOIN cnt cb ON cb.doc_id = c.doc_b
                  LEFT JOIN inter i ON i.doc_a = c.doc_a
                                   AND i.doc_b = c.doc_b)
            SELECT doc_a, doc_b,
                   CAST(round((CASE WHEN u = 0 THEN 1.0
                                    ELSE i::DOUBLE / u END) * 1e6) AS BIGINT)
                     AS jaccard_micro
            FROM j
            WHERE (CASE WHEN u = 0 THEN 1.0 ELSE i::DOUBLE / u END) >= 0.5
        """,
        # the COMPLETE all-pairs shingle join (docs sharing >= 1 shingle,
        # exact Jaccard >= t) — the Ray side must find every pair despite
        # its prefix filter, so a hash match proves AllPairs completeness
        "ngram_jaccard": f"""
            WITH {_shingle_cte(5)},
            cnt AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                             count(*) AS i
                      FROM shs x JOIN shs y ON y.sh = x.sh
                                           AND y.doc_id > x.doc_id
                      GROUP BY 1, 2),
            j AS (SELECT i.doc_a, i.doc_b, i.i,
                         ca.n + cb.n - i.i AS u
                  FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
                               JOIN cnt cb ON cb.doc_id = i.doc_b)
            SELECT doc_a, doc_b,
                   CAST(round(i::DOUBLE / u * 1e6) AS BIGINT) AS jaccard_micro
            FROM j WHERE i::DOUBLE / u >= 0.4
        """,
        # connected components of the exact-Jaccard pair graph: recursive
        # transitive closure, comp = min reachable id (the Ray side's
        # iterative min-label contraction must converge to the same table)
        "neardup_clusters": f"""
            WITH RECURSIVE {_shingle_cte(5)},
            cnt AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                             count(*) AS i
                      FROM shs x JOIN shs y ON y.sh = x.sh
                                           AND y.doc_id > x.doc_id
                      GROUP BY 1, 2),
            jp AS (SELECT i.doc_a, i.doc_b
                   FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
                                JOIN cnt cb ON cb.doc_id = i.doc_b
                   WHERE i.i::DOUBLE / (ca.n + cb.n - i.i) >= 0.4),
            e AS (SELECT doc_a AS u, doc_b AS v FROM jp
                  UNION SELECT doc_b, doc_a FROM jp),
            walk(node, comp) AS (
                SELECT u, u FROM e
                UNION
                SELECT w.node, e.v FROM walk w JOIN e ON e.u = w.comp
            )
            SELECT node, min(comp) AS comp FROM walk GROUP BY node
        """,
        # canonical-doc dedup: keep every doc except non-minimum members
        # of a pair-graph component
        "dedup_keep_canonical": f"""
            WITH RECURSIVE {_shingle_cte(5)},
            cnt AS (SELECT doc_id, count(*) AS n FROM shs GROUP BY doc_id),
            inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                             count(*) AS i
                      FROM shs x JOIN shs y ON y.sh = x.sh
                                           AND y.doc_id > x.doc_id
                      GROUP BY 1, 2),
            jp AS (SELECT i.doc_a, i.doc_b
                   FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
                                JOIN cnt cb ON cb.doc_id = i.doc_b
                   WHERE i.i::DOUBLE / (ca.n + cb.n - i.i) >= 0.4),
            e AS (SELECT doc_a AS u, doc_b AS v FROM jp
                  UNION SELECT doc_b, doc_a FROM jp),
            walk(node, comp) AS (
                SELECT u, u FROM e
                UNION
                SELECT w.node, e.v FROM walk w JOIN e ON e.u = w.comp
            ),
            victims AS (SELECT node FROM walk GROUP BY node
                        HAVING node <> min(comp))
            SELECT d.doc_id FROM documents d
            WHERE d.doc_id NOT IN (SELECT node FROM victims)
        """,
        # deterministic key-hash sampling (keep iff fnv1a64(id) %% 1e6 < t)
        "dataset_split": f"""
            SELECT doc_id,
                   CASE WHEN {_fnv64_id_sql('doc_id')} % 1000000 < 800000
                          THEN 'train'
                        WHEN {_fnv64_id_sql('doc_id')} % 1000000 < 900000
                          THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "hash_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_fnv64_id_sql('doc_id')} % 1000000 < 250000
        """,
        "stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_fnv64_id_sql('doc_id')} % 1000000 <
                  CASE lang WHEN 'en' THEN 100000 WHEN 'zh' THEN 1000000
                            WHEN 'fr' THEN 500000 ELSE 300000 END
        """,
        # identical RE2 patterns through DuckDB's RE2 (dollar-quoted to
        # keep backslashes literal), same application order
        "redact_pii": _redact_pii_sql(),
        "top_k_per_group": """
            SELECT lang, doc_id, n_chars FROM (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars DESC, doc_id)
                           AS rn
                FROM documents) WHERE rn <= 3
        """,
        "normalize_text": r"""
            SELECT doc_id,
                   trim(regexp_replace(lower(nfc_normalize(text)),
                                       '\s+', ' ', 'g')) AS text
            FROM documents
        """,
        # quantile_disc = element at sorted index max(ceil(q*N)-1, 0),
        # the exact rule value_quantiles implements over the histogram
        "length_quantiles": """
            WITH qv AS (SELECT quantile_disc(n_chars,
                            [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS v
                        FROM documents)
            SELECT unnest(CAST([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
                               AS DOUBLE[])) AS q,
                   CAST(unnest(v) AS BIGINT) AS value
            FROM qv
        """,
        # continuous-domain twin: same quantile_disc rule over the float
        # events.value column (float_quantiles narrowing path)
        "float_quantiles": """
            WITH qv AS (SELECT quantile_disc(value,
                            [0.05, 0.25, 0.5, 0.75, 0.95]) AS v
                        FROM events)
            SELECT unnest(CAST([0.05, 0.25, 0.5, 0.75, 0.95]
                               AS DOUBLE[])) AS q,
                   CAST(round(unnest(v) * 1e6) AS BIGINT) AS value_micro
            FROM qv
        """,
        # DuckDB's native ASOF JOIN: greatest purchase ts <= click ts per
        # user, inner semantics — the exact contract of datapipe.joins
        "asof_join": """
            SELECT c.user_id, c.event_id,
                   epoch_us(c.ts) AS left_ts, epoch_us(p.ts) AS right_ts,
                   CAST(round(p.value * 1e6) AS BIGINT) AS value_micro
            FROM (SELECT user_id, event_id, ts FROM events
                  WHERE event_type = 'click') c
            ASOF JOIN (SELECT user_id, ts, value FROM events
                       WHERE event_type = 'purchase') p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        "interval_join": """
            SELECT p.user_id, p.event_id, c.event_id AS click_id,
                   epoch_us(c.ts) AS right_ts
            FROM events p JOIN events c ON p.user_id = c.user_id
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
              AND epoch_us(c.ts)
                  BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        """,
        "semi_join": """
            SELECT l_orderkey, l_linenumber,
                   CAST(round(l_quantity * 1e6) AS BIGINT) AS l_quantity_micro
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE o_orderpriority = '1-URGENT')
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_orderpriority = '1-URGENT')
        """,
        # each event lands in exactly window_s/hop_s = 4 hopping windows:
        # the windows starting at (hop_bucket(ts) - j) * hop for j in 0..3
        "events_hopping": """
            WITH e AS (SELECT user_id, epoch_us(ts) // 900000000 AS hb, value
                       FROM events),
            x AS (SELECT user_id, (hb - j.j) * 900 AS window_start, value
                  FROM e CROSS JOIN (SELECT unnest(range(4)) AS j) j)
            SELECT user_id, window_start, count(*)::BIGINT AS n_events,
                   CAST(round(sum(value) * 1e6) AS BIGINT) AS sum_value_micro
            FROM x GROUP BY user_id, window_start
        """,
        "broadcast_join": """
            SELECT c_custkey, c_name, c_nationkey, n_name
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
        # money summed in exact integer ten-thousandths on both sides —
        # order-independent, so the value hash is engine-portable
        "lineitem_rollup": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 1e4) AS BIGINT)) AS BIGINT)
                       AS sum_disc_price_c,
                   CAST(round(avg(round(l_quantity)) * 1e6) AS BIGINT)
                       AS avg_qty_micro,
                   count(*)::BIGINT AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        # the SAME RE2 pattern string (single source of truth) through
        # DuckDB's RE2 — non-overlapping left-to-right match counts agree
        "token_count_bpe": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, $bpe${_BPE_PATTERN}$bpe$))
                       ::BIGINT AS n_bpe_tokens
            FROM documents
        """,
        "distinct_users": """
            SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type
        """,
        # HyperLogLog register table, bit-for-bit: FNV-1a over user_id's 8
        # LE bytes (the fnv1a_u64 twin) + splitmix64 finalizer (the mix64
        # twin; FNV alone is not avalanche-grade — sketch.py:mix64),
        # bucket = h >> 52, and rho from an INTEGER-ONLY bit-length
        # (smear + bit_count) — float log2 would round across exact
        # power-of-two boundaries.
        "hll_sketch": f"""
            WITH h0 AS (SELECT {_fnv64_id_sql('user_id')} AS h
                        FROM events WHERE user_id IS NOT NULL),
            {_mix64_sql_ctes('f', 'h0')},
            bw AS (SELECT CAST(h >> 52 AS BIGINT) AS bucket,
                          h & ((CAST(1 AS UBIGINT) << 52) - 1) AS w
                   FROM f5),
            s1 AS (SELECT bucket, w | (w >> 1) AS s FROM bw),
            s2 AS (SELECT bucket, s | (s >> 2) AS s FROM s1),
            s3 AS (SELECT bucket, s | (s >> 4) AS s FROM s2),
            s4 AS (SELECT bucket, s | (s >> 8) AS s FROM s3),
            s5 AS (SELECT bucket, s | (s >> 16) AS s FROM s4),
            s6 AS (SELECT bucket, s | (s >> 32) AS s FROM s5)
            SELECT bucket, MAX(CAST(52 - bit_count(s) + 1 AS BIGINT)) AS rho
            FROM s6 GROUP BY bucket
        """,
        # Bloom anti-filter, bit-for-bit: h1 = mix64(fnv(user_id)),
        # h2 = mix64(h1 xor GOLDEN) | 1, probes (h1 + i*h2) mod 2^64
        # masked to m-1 (m=4096, k=3); a row is a member iff ALL its
        # probe positions appear in the blocklist's position set.
        "bloom_filter_events": f"""
            WITH bl0 AS (SELECT DISTINCT user_id AS v FROM events
                         WHERE event_type = 'error' AND value > 200.0
                           AND user_id IS NOT NULL),
            bh0 AS (SELECT {_fnv64_id_sql('v')} AS h FROM bl0),
            {_mix64_sql_ctes('ba', 'bh0')},
            bg0 AS (SELECT h AS h1,
                           xor(h, CAST(11400714819323198485 AS UBIGINT)) AS h
                    FROM ba5),
            {_mix64_sql_ctes('bb', 'bg0', cols='h1')},
            bset AS (SELECT h1, h | CAST(1 AS UBIGINT) AS h2 FROM bb5),
            bpos AS (SELECT DISTINCT
                       CAST(((CAST(h1 AS HUGEINT) + r.i * CAST(h2 AS HUGEINT))
                             % 18446744073709551616) AS UBIGINT) & 4095 AS p
                     FROM bset, range(3) r(i)),
            eh0 AS (SELECT event_id, user_id,
                           {_fnv64_id_sql('user_id')} AS h FROM events),
            {_mix64_sql_ctes('ea', 'eh0', cols='event_id, user_id')},
            eg0 AS (SELECT event_id, user_id, h AS h1,
                           xor(h, CAST(11400714819323198485 AS UBIGINT)) AS h
                    FROM ea5),
            {_mix64_sql_ctes('eb', 'eg0', cols='event_id, user_id, h1')},
            eset AS (SELECT event_id, user_id, h1,
                            h | CAST(1 AS UBIGINT) AS h2 FROM eb5),
            epos AS (SELECT event_id,
                       CAST(((CAST(h1 AS HUGEINT) + r.i * CAST(h2 AS HUGEINT))
                             % 18446744073709551616) AS UBIGINT) & 4095 AS p
                     FROM eset, range(3) r(i)),
            memb AS (SELECT event_id FROM epos JOIN bpos USING (p)
                     GROUP BY event_id HAVING count(*) = 3)
            SELECT event_id, user_id FROM events
            WHERE event_id NOT IN (SELECT event_id FROM memb)
        """,
        # Count-min cell table, bit-for-bit: same double-hash chain as the
        # bloom oracle, cell_i = (h1 + i*h2) mod 2^64 masked to width-1,
        # exact integer counts per (depth, cell).
        "cms_sketch": f"""
            WITH eh0 AS (SELECT {_fnv64_id_sql('user_id')} AS h
                         FROM events WHERE user_id IS NOT NULL),
            {_mix64_sql_ctes('ca', 'eh0')},
            cg0 AS (SELECT h AS h1,
                           xor(h, CAST(11400714819323198485 AS UBIGINT)) AS h
                    FROM ca5),
            {_mix64_sql_ctes('cb', 'cg0', cols='h1')},
            cset AS (SELECT h1, h | CAST(1 AS UBIGINT) AS h2 FROM cb5),
            cpos AS (SELECT r.i AS depth,
                       CAST(((CAST(h1 AS HUGEINT) + r.i * CAST(h2 AS HUGEINT))
                             % 18446744073709551616) AS UBIGINT) & 511 AS cell
                     FROM cset, range(4) r(i))
            SELECT depth, CAST(cell AS BIGINT) AS cell,
                   count(*)::BIGINT AS cnt
            FROM cpos GROUP BY depth, cell
        """,
    }
    # federation must be indistinguishable from one global index: the
    # oracle IS the global BM25 (same SQL as bm25_topk)
    d["federated_bm25_topk"] = d["bm25_topk"]
    # a snapshot-store publish/rollback round-trip serves the identical
    # index: the oracle IS the vocabulary stats (same SQL as term_stats)
    d["snapshot_term_stats"] = d["term_stats"]
    # consolidated upsert == full re-index of the logically updated corpus
    # (doc_id%7==3 re-revisioned with a marker suffix, doc_id%11==5 spawns
    # an insert at doc_id+10M) — the term_stats SQL over that corpus
    d["upsert_term_stats"] = f"""
        WITH updated AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3
          UNION ALL
          SELECT doc_id, text || ' zzupserted marker' FROM documents
          WHERE doc_id % 7 = 3
          UNION ALL
          SELECT doc_id + 10000000, 'zzbrandnew ' || text FROM documents
          WHERE doc_id % 11 = 5
        ),
        docs AS (SELECT doc_id,
                        regexp_extract_all(lower(text), {TOKEN_RE_SQL})
                          AS toks
                 FROM updated),
        toks AS (SELECT doc_id, unnest(toks) AS term FROM docs),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM toks GROUP BY doc_id, term)
        SELECT term, count(*) AS df, sum(tf)::BIGINT AS cf
        FROM tf GROUP BY term
    """
    return d
