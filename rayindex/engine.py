"""Public API of the rayindex engine.

    from rayindex.engine import build_index, IndexReader, search_dataset

- ``build_index(source, out_dir, cfg)`` — full index build (rayindex.build).
- ``IndexReader(out_dir)`` — in-process reader: ``.search(query, k)``.
- ``Searcher`` / ``search_dataset(queries, out_dir)`` — actor-pool batch
  query evaluation over a Ray Dataset of queries.
- ``OracleEngine`` — the executable spec (testing / tiny corpora only).
- ``adapt_documents(ds, ...)`` — map an arbitrary documents table onto the
  engine's input schema (repo, path, commit, lang, content).
"""

from __future__ import annotations

import pyarrow as pa

from rayindex.build import BuildResult, build_index  # noqa: F401
from rayindex.config import AnalyzerConfig, BuildConfig, SearchConfig  # noqa: F401
from rayindex.oracle import OracleEngine  # noqa: F401
from rayindex.searcher import (  # noqa: F401
    IndexReader,
    Searcher,
    ShardedSearchPool,
    fetch_doc_metadata,
    search_dataset,
)
from rayindex.spell import SpellChecker  # noqa: F401
from rayindex.upload import upload_index, verify_upload  # noqa: F401


def adapt_documents(ds, *, repo_col: str | None = None, path_col: str | None = None,
                    lang_col: str | None = None, content_col: str = "content"):
    """Project any documents-like Dataset onto the engine input schema.

    Missing columns become constants; ``path`` falls back to a zero-padded
    row key so the global (repo, path) sort stays deterministic.
    """

    def to_schema(t: pa.Table) -> pa.Table:
        n = t.num_rows
        repo = t[repo_col] if repo_col else pa.array(["corpus"] * n)
        if path_col:
            path = pa.compute.cast(t[path_col], pa.string())
            if path_col != "path":
                # zero-pad numeric keys so lexicographic order == numeric order
                path = pa.array([p.zfill(12) for p in path.to_pylist()])
        else:
            path = pa.array([""] * n)
        lang = t[lang_col] if lang_col else pa.array(["txt"] * n)
        return pa.table(
            {
                "repo": pa.compute.cast(repo, pa.string()),
                "path": path,
                "commit": pa.array([""] * n, pa.string()),
                "lang": pa.compute.cast(lang, pa.string()),
                "content": pa.compute.cast(t[content_col], pa.large_string()),
            }
        )

    return ds.map_batches(to_schema, batch_format="pyarrow", zero_copy_batch=True)
