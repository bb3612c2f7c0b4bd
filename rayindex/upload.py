"""Index upload to object storage with a sha256 manifest (reference S10).

Re-expresses the reference's GCS uploader + hasher
(/root/reference/indexing/gcs_file_generator/gcs_file_generator.py:26-77)
storage-agnostically over fsspec: one Ray task per artifact file streams
it to the destination URI and hashes it on the way; a ``manifest.json``
of {relpath: {sha256, bytes}} lands last, so a partially-uploaded index
is detectable (no manifest → incomplete).  The uploaded tree is directly
servable by ``IndexReader("<dest_uri>")`` via byte-range reads — no
download step.
"""

from __future__ import annotations

import hashlib
import json
import os

import ray

_CHUNK = 8 << 20


@ray.remote
def _upload_one(src: str, dest_path: str, fs_url: str) -> tuple[str, str, int]:
    import fsspec

    fs, _ = fsspec.core.url_to_fs(fs_url)
    h = hashlib.sha256()
    n = 0
    parent = dest_path.rsplit("/", 1)[0]
    try:
        fs.makedirs(parent, exist_ok=True)
    except Exception:
        pass
    with open(src, "rb") as fin, fs.open(dest_path, "wb") as fout:
        while True:
            chunk = fin.read(_CHUNK)
            if not chunk:
                break
            h.update(chunk)
            n += len(chunk)
            fout.write(chunk)
    return dest_path, h.hexdigest(), n


def upload_index(index_dir: str, dest_uri: str) -> dict[str, dict]:
    """Upload every artifact under ``index_dir`` to ``dest_uri``; returns
    (and writes) the manifest {relpath: {"sha256": ..., "bytes": ...}}."""
    import fsspec

    fs, root = fsspec.core.url_to_fs(dest_uri)
    root = root.rstrip("/")
    files = []
    for dirpath, _, names in os.walk(index_dir):
        for name in sorted(names):
            src = os.path.join(dirpath, name)
            rel = os.path.relpath(src, index_dir)
            files.append((src, rel))
    refs = [_upload_one.remote(src, f"{root}/{rel}", dest_uri)
            for src, rel in sorted(files, key=lambda x: x[1])]
    done = ray.get(refs)
    manifest = {}
    for (src, rel), (_, sha, n) in zip(sorted(files, key=lambda x: x[1]), done):
        manifest[rel] = {"sha256": sha, "bytes": n}
    with fs.open(f"{root}/manifest.json", "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)
    return manifest


def verify_upload(dest_uri: str) -> bool:
    """Re-hash every uploaded artifact against the manifest."""
    import fsspec

    fs, root = fsspec.core.url_to_fs(dest_uri)
    root = root.rstrip("/")
    with fs.open(f"{root}/manifest.json") as f:
        manifest = json.load(f)
    for rel, meta in manifest.items():
        h = hashlib.sha256()
        with fs.open(f"{root}/{rel}", "rb") as f:
            while True:
                chunk = f.read(_CHUNK)
                if not chunk:
                    break
                h.update(chunk)
        if h.hexdigest() != meta["sha256"]:
            return False
    return True
