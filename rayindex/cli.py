"""Command-line entry points — the ``ray job submit`` surface.

    # build an index (driver == this script; Ray auto-connects in a job)
    ray job submit --working-dir . -- python -m rayindex.build \
        --source /data/corpus --out /data/index --num-shards 64

    # run queries against it
    python -m rayindex.search --index /data/index --query "def parse" -k 10

In a sandbox/local shell the same commands work standalone: the script
initialises a local Ray session only when none exists (inside ``ray job
submit`` the cluster connection is already up and is reused).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _in_job() else "local",
                 include_dashboard=False, logging_level="ERROR")


def _in_job() -> bool:
    import os

    return bool(os.environ.get("RAY_JOB_ID"))


def main_build(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rayindex.build",
                                description="Build a full-text BM25 index from a "
                                            "Parquet corpus (repo, path, commit, lang, content)")
    p.add_argument("--source", required=True, help="Parquet file/dir of documents")
    p.add_argument("--out", required=True, help="output index directory")
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--analyzer", choices=["reference", "ascii", "code"], default="reference")
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--doc-range-size", type=int, default=1 << 17)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--no-positions", action="store_true",
                   help="TF-only index (no phrase/proximity support)")
    p.add_argument("--no-verify", action="store_true",
                   help="skip the per-row sha256 ingest invariant")
    args = p.parse_args(argv)

    _ensure_ray()
    from rayindex.config import AnalyzerConfig, BuildConfig
    from rayindex.engine import build_index

    cfg = BuildConfig(
        analyzer=AnalyzerConfig(mode=args.analyzer),
        num_shards=args.num_shards,
        block_size=args.block_size,
        doc_range_size=args.doc_range_size,
        tokenize_batch_size=args.batch_size,
        keep_positions=not args.no_positions,
        verify_sha256=not args.no_verify,
    )
    res = build_index(args.source, args.out, cfg)
    print(json.dumps({"out": res.out_dir, "fingerprint": res.fingerprint,
                      "stages": res.stages}, indent=1))
    return 0


def main_merge(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="rayindex.merge",
        description="Fold index B into index A (incremental ingest): "
                    "B's doc ids are rebased past A's doc space; postings "
                    "splice decode-free.  Both inputs are left untouched.")
    p.add_argument("--a", required=True, help="base index directory")
    p.add_argument("--b", required=True, action="append",
                   help="increment index directory (repeat for an N-way "
                        "one-pass merge, in ingest order)")
    p.add_argument("--out", required=True, help="merged index directory")
    p.add_argument("--num-shards", type=int, default=None,
                   help="output shard count (default: A's modulus, "
                        "inferred from its highest shard id).  Pass it "
                        "when A's top shards could be empty/absent; a "
                        "value different from A's modulus re-shards "
                        "EVERY side's terms (slower — prefer compact "
                        "--num-shards for a pure re-shard)")
    args = p.parse_args(argv)

    _ensure_ray()
    from rayindex.merge import merge_many

    print(json.dumps(merge_many([args.a] + args.b, args.out,
                                num_shards=args.num_shards), indent=1))
    return 0


def main_delete(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="rayindex.delete",
        description="Delete documents from an index (GDPR/takedown path): "
                    "ids become holes, postings drop the docs block-wise, "
                    "all stats recompute.  The input is left untouched.")
    p.add_argument("--index", required=True, help="input index directory")
    p.add_argument("--out", required=True, help="output index directory")
    p.add_argument("--doc-ids", default=None,
                   help="comma-separated engine doc ids")
    p.add_argument("--tombstone", action="store_true",
                   help="O(ids) takedown: mark the docs deleted in "
                        "stats/tombstones.bin (searchers hide them "
                        "immediately; stats stay pre-delete) instead of "
                        "re-encoding postings.  Run rayindex.compact "
                        "later to purge physically")
    p.add_argument("--where", default=None, metavar="COL=VALUE",
                   help="doc-store metadata equality filter, e.g. "
                        "repo=org1/proj1 or lang=py; VALUE is cast to the "
                        "column's schema type.  Repeating --where deletes "
                        "docs matching ANY clause (OR semantics)",
                   action="append")
    args = p.parse_args(argv)
    if not args.doc_ids and not args.where:
        p.error("one of --doc-ids / --where is required")

    _ensure_ray()
    from rayindex.delete import delete_docs, tombstone_docs

    expr = None
    if args.where:
        import glob

        import pyarrow as pa
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        parts = sorted(glob.glob(os.path.join(args.index, "doc_store",
                                              "*.parquet")))
        sch = pq.read_schema(parts[0]) if parts else None
        for w in args.where:
            col, _, val = w.partition("=")
            typed: Any = val
            if sch is not None:
                if col not in sch.names:
                    p.error(f"--where column {col!r} not in the doc store "
                            f"(have: {', '.join(sch.names)})")
                try:  # cast "5" → 5 for numeric columns etc.
                    typed = pa.scalar(val).cast(sch.field(col).type)
                except pa.ArrowInvalid:
                    p.error(f"--where value {val!r} is not castable to "
                            f"{col}'s type {sch.field(col).type}")
            e = pads.field(col) == typed
            expr = e if expr is None else (expr | e)
    ids = [int(x) for x in args.doc_ids.split(",")] if args.doc_ids else None
    fn = tombstone_docs if args.tombstone else delete_docs
    print(json.dumps(fn(args.index, args.out, doc_ids=ids,
                        filter_expr=expr), indent=1))
    return 0


def main_compact(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="rayindex.compact",
        description="Renumber doc ids densely (close delete/filter holes) "
                    "and rewrite shards canonically; --num-shards re-shards "
                    "without re-tokenizing.  The input is left untouched.")
    p.add_argument("--index", required=True, help="input index directory")
    p.add_argument("--out", required=True, help="output index directory")
    p.add_argument("--num-shards", type=int, default=16)
    p.add_argument("--block-size", type=int, default=128)
    args = p.parse_args(argv)

    _ensure_ray()
    from rayindex.compact import compact_index
    from rayindex.config import BuildConfig

    cfg = BuildConfig(num_shards=args.num_shards, block_size=args.block_size)
    print(json.dumps(compact_index(args.index, args.out, cfg), indent=1))
    return 0


def main_convert(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="rayindex.convert",
        description="Convert a positional index to TF-only (drop position "
                    "streams; phrase/proximity stop working, scorers keep "
                    "working).  The input is left untouched.")
    p.add_argument("--index", required=True, help="input index directory")
    p.add_argument("--out", required=True, help="output index directory")
    args = p.parse_args(argv)

    _ensure_ray()
    from rayindex.convert import strip_positions

    print(json.dumps(strip_positions(args.index, args.out), indent=1))
    return 0


def main_fsck(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="rayindex.fsck",
        description="Check an index's structural invariants (dict/blob "
                    "tiling, block metadata, doc-side stats); --deep adds "
                    "a full posting decode.  Exit 1 on any error.")
    p.add_argument("--index", required=True)
    p.add_argument("--deep", action="store_true")
    args = p.parse_args(argv)

    _ensure_ray()
    from rayindex.fsck import fsck_index

    report = fsck_index(args.index, deep=args.deep)
    print(json.dumps(report, indent=1))
    return 0 if report["ok"] else 1


def main_search(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="rayindex.search",
                                description="Query a built index")
    p.add_argument("--index", required=True, action="append",
                   help="index directory; repeat to FEDERATE several "
                        "indexes (base + deltas) at query time — results "
                        "are identical to searching their offline merge")
    p.add_argument("--query", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--scorer", default="bm25",
                   choices=["bm25", "reference", "lm", "lm-dirichlet", "vsm"])
    p.add_argument("--algorithm", default="taat", choices=["taat", "bmw"])
    p.add_argument("--analyzer", choices=["reference", "ascii", "code"], default="reference")
    p.add_argument("--lang", default=None, help="metadata filter")
    p.add_argument("--show-docs", action="store_true",
                   help="join results to the doc store metadata")
    p.add_argument("--spellcheck", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="Norvig correction over the index vocabulary before "
                        "querying — ON by default for plain queries, like "
                        "the reference (views.py spellchecks every plain "
                        "query); boolean/proximity/phrase queries pass "
                        "through untouched.  --no-spellcheck disables")
    args = p.parse_args(argv)

    from rayindex.config import AnalyzerConfig, SearchConfig
    from rayindex.searcher import IndexReader, fetch_doc_metadata

    if len(args.index) > 1:
        from rayindex.federate import FederatedReader

        reader = FederatedReader(args.index)
    else:
        reader = IndexReader(args.index[0])
    cfg = SearchConfig(scorer=args.scorer if args.scorer not in ("lm", "lm-dirichlet", "vsm") else "bm25",
                       algorithm=args.algorithm)
    query = args.query
    corrected = False
    if args.spellcheck:
        from rayindex.query import TermsQuery, parse_query
        from rayindex.spell import SpellChecker

        # reference parity: only PLAIN queries are spellchecked
        # (boolean/proximity operators would be corrupted by correction)
        if isinstance(parse_query(query, AnalyzerConfig(mode=args.analyzer)),
                      TermsQuery):
            query, corrected = \
                SpellChecker.from_index(reader).correct_query(query)
    res = reader.search(query, k=args.k, search_cfg=cfg,
                        analyzer=AnalyzerConfig(mode=args.analyzer),
                        scorer=args.scorer, lang=args.lang)
    out = [{"rank": i + 1, "doc_id": d, "score": s} for i, (d, s) in enumerate(res)]
    if corrected:
        print(json.dumps({"corrected_query": query}), file=sys.stderr)
    if args.show_docs and out:
        ids = [r["doc_id"] for r in out]
        meta = (reader.fetch_doc_metadata(ids)
                if len(args.index) > 1
                else fetch_doc_metadata(args.index[0], ids)).to_pylist()
        by_id = {m["doc_id"]: m for m in meta}
        for r in out:
            m = by_id.get(r["doc_id"], {})
            r.update({"repo": m.get("repo"), "path": m.get("path"),
                      "lang": m.get("lang")})
    print(json.dumps(out, indent=1))
    return 0


def main_snapshot(argv: list[str] | None = None) -> int:
    """Snapshot-store lifecycle: publish / rollback / prune / list
    (rayindex/snapshot.py; no Ray session needed — pure pointer and
    hard-link metadata ops)."""
    from rayindex import snapshot as sn

    p = argparse.ArgumentParser(
        prog="rayindex.snapshot",
        description="Versioned index snapshot store: atomic publish / "
                    "rollback / prune; serve the live version with "
                    "`python -m rayindex.serve --store ...` and hot-swap "
                    "via /reload.")
    sub = p.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("publish", help="stage an index dir as the next "
                                        "version and flip CURRENT to it")
    sp.add_argument("--store", required=True)
    sp.add_argument("--index", required=True)
    sp.add_argument("--note", default="")
    sr = sub.add_parser("rollback", help="point CURRENT at an existing "
                                         "version (no data motion)")
    sr.add_argument("--store", required=True)
    sr.add_argument("--version", type=int, required=True)
    sq = sub.add_parser("prune", help="drop the oldest versions beyond "
                                      "--keep (never the current one)")
    sq.add_argument("--store", required=True)
    sq.add_argument("--keep", type=int, default=2)
    sl = sub.add_parser("list", help="versions + live pointer")
    sl.add_argument("--store", required=True)
    args = p.parse_args(argv)

    if args.cmd == "publish":
        v = sn.publish(args.store, args.index, note=args.note)
        print(json.dumps({"published": v, "current": v}))
    elif args.cmd == "rollback":
        sn.rollback(args.store, args.version)
        print(json.dumps({"current": args.version}))
    elif args.cmd == "prune":
        removed = sn.prune(args.store, keep=args.keep)
        print(json.dumps({"removed": removed,
                          "current": sn.current_version(args.store)}))
    else:
        print(json.dumps({"current": sn.current_version(args.store),
                          "versions": sn.versions(args.store)}))
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main_build())
