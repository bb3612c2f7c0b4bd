"""Versioned index snapshot store: atomic publish / rollback / prune.

Production serving needs atomic index swaps: a new index (fresh build,
``merge_many``, ``compact``, ``consolidate_upsert``) must become visible
to every searcher in ONE step, with instant rollback and no torn reads.
The reference has no story for this — its Django app loads one pickled
index at app startup (/root/reference/search/retrieval/apps.py) and a
redeploy IS the swap.  Here the store is a directory of immutable
versioned index dirs plus one small ``CURRENT`` pointer file; the flip
is a single ``os.replace``, which on shared/object storage maps to one
small-object PUT (readers poll the pointer — one small GET — and never
restart or copy the index).

Layout::

    store/
      v000001/            complete, immutable index dir
      v000002/
      CURRENT             json {"version": 2, "published_ts": ..., "note": ...}
      HISTORY.jsonl       append-only audit of every flip

Invariants:

- a version dir is IMMUTABLE once ``CURRENT`` has ever named it;
  ``publish`` only ever adds a new dir, then flips the pointer.
- a publish that crashes between staging and flip leaves a dir that
  ``CURRENT`` never named: invisible to every reader, reclaimed by the
  next ``publish`` (which re-stages the same version number).
- ``rollback`` is a pointer flip to an existing version — no data moves.
- ``prune`` never removes the version ``CURRENT`` names.

Scale shape: version dirs are hard-linked from the source on the same
filesystem (O(files) metadata ops, zero data copy — the same trick
``tombstone_docs`` uses), or streamed file-by-file across filesystems.
On a cluster the store lives on shared storage; every searcher node
resolves ``current_dir`` independently and serves the same version.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import time
from typing import Any

_PTR = "CURRENT"
_HIST = "HISTORY.jsonl"


def _vdir(store_dir: str, version: int) -> str:
    return os.path.join(store_dir, f"v{version:06d}")


def _is_index_dir(path: str) -> bool:
    """Every serve-able index shape (build, merge, compact, delete,
    tombstone, consolidated upsert) carries collection stats + shards."""
    return (os.path.isfile(os.path.join(path, "stats",
                                        "collection_stats.parquet"))
            and os.path.isdir(os.path.join(path, "shards")))


def _read_ptr(store_dir: str) -> dict[str, Any] | None:
    try:
        with open(os.path.join(store_dir, _PTR)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _flip(store_dir: str, rec: dict[str, Any]) -> None:
    """Atomic pointer write + audit append."""
    tmp = os.path.join(store_dir, f".{_PTR}.tmp-{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(store_dir, _PTR))
    with open(os.path.join(store_dir, _HIST), "a") as f:
        f.write(json.dumps(rec) + "\n")


def current_version(store_dir: str) -> int | None:
    ptr = _read_ptr(store_dir)
    return int(ptr["version"]) if ptr else None


def current_dir(store_dir: str) -> str:
    """Path of the live version (raises if the store has no pointer)."""
    v = current_version(store_dir)
    if v is None:
        raise FileNotFoundError(f"{store_dir}: no {_PTR} pointer "
                                "(nothing published yet)")
    return _vdir(store_dir, v)


def versions(store_dir: str) -> list[dict[str, Any]]:
    """All version dirs with their live/orphan status (an orphan is a
    staged dir the pointer never named — a torn publish)."""
    cur = current_version(store_dir)
    hist_named: set[int] = set()
    try:
        with open(os.path.join(store_dir, _HIST)) as f:
            hist_named = {int(json.loads(ln)["version"]) for ln in f
                          if ln.strip()}
    except FileNotFoundError:
        pass
    out = []
    for d in sorted(glob.glob(os.path.join(store_dir, "v" + "[0-9]" * 6))):
        v = int(os.path.basename(d)[1:])
        out.append({"version": v, "path": d, "current": v == cur,
                    "orphan": v not in hist_named})
    return out


def _stage(src: str, dst: str) -> None:
    """Copy ``src`` index dir to ``dst``: hard links on the same
    filesystem (zero data copy), byte copy across filesystems."""
    if os.path.exists(dst):  # torn previous publish — reclaim
        shutil.rmtree(dst)
    tmp = dst + f".staging-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)

    def _link_or_copy(s: str, d: str) -> None:
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)

    shutil.copytree(src, tmp, copy_function=_link_or_copy)
    os.replace(tmp, dst)


def publish(store_dir: str, index_dir: str, note: str = "") -> int:
    """Stage ``index_dir`` as the next version and atomically flip the
    pointer to it.  Returns the new version number.  The source dir is
    left untouched (staging hard-links on the same filesystem)."""
    if not _is_index_dir(index_dir):
        if os.path.isfile(os.path.join(index_dir, "federation.json")):
            raise ValueError(
                f"{index_dir}: is an upsert federation dir — run "
                "consolidate_upsert() (or rayindex.upsert CLI) first and "
                "publish the consolidated index; federations serve live "
                "via open_upsert()/--index repetition instead")
        raise ValueError(f"{index_dir}: not a complete index "
                         "(missing stats/collection_stats.parquet or shards/)")
    os.makedirs(store_dir, exist_ok=True)
    existing = [int(os.path.basename(d)[1:]) for d in
                glob.glob(os.path.join(store_dir, "v" + "[0-9]" * 6))]
    cur = current_version(store_dir)
    # reclaim orphans: reuse the number right after the last version the
    # pointer has ever named (orphan dirs get overwritten by _stage)
    hist_max = max([cur or 0] + [v["version"] for v in versions(store_dir)
                                 if not v["orphan"]] or [0])
    v = max([hist_max] + [x for x in existing if x <= hist_max]) + 1
    dst = _vdir(store_dir, v)
    _stage(index_dir, dst)
    _flip(store_dir, {"version": v, "op": "publish", "note": note,
                      "source": os.path.abspath(index_dir),
                      "published_ts": time.time()})
    return v


def rollback(store_dir: str, version: int) -> None:
    """Point ``CURRENT`` back at an existing version (no data motion)."""
    dst = _vdir(store_dir, version)
    if not _is_index_dir(dst):
        raise ValueError(f"{store_dir}: no complete version {version}")
    _flip(store_dir, {"version": int(version), "op": "rollback",
                      "published_ts": time.time()})


def prune(store_dir: str, keep: int = 2) -> list[int]:
    """Remove the oldest version dirs beyond the newest ``keep``,
    never the current one; also clears orphaned staging dirs.  Returns
    the removed version numbers."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    cur = current_version(store_dir)
    vs = versions(store_dir)
    removed = []
    for rec in vs[:-keep] if keep < len(vs) else []:
        if rec["version"] == cur:
            continue
        shutil.rmtree(rec["path"])
        removed.append(rec["version"])
    for d in glob.glob(os.path.join(store_dir, "v*.staging-*")):
        shutil.rmtree(d, ignore_errors=True)
    return removed


if __name__ == "__main__":  # pragma: no cover — CLI entry
    import sys

    from rayindex.cli import main_snapshot

    sys.exit(main_snapshot())
