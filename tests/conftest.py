"""Shared pytest fixtures.

Ray is initialised ONCE per test session (local mode, small CPU count) and
shut down at teardown; individual tests must never call ray.init/shutdown.
"""

from __future__ import annotations

import os

import pytest

# keep freed heap pages resident (this sandbox's VM reclaims free guest
# pages and re-faulting is ~0.1 ms/page); must be set before ray.init so
# workers inherit it — see bench._prewarm_memory for measurements
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray.data import DataContext

        ctx = DataContext.get_current()
        ctx.enable_progress_bars = False
    except Exception:
        pass
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_build(ray_session, tmp_path_factory):
    """One tiny-corpus index build shared by the whole session."""
    import pyarrow.parquet as pq

    from rayindex import corpus
    from rayindex.build import build_index
    from rayindex.config import BuildConfig

    root = tmp_path_factory.mktemp("tiny")
    src = root / "src"
    src.mkdir()
    tbl = corpus.tiny_corpus()
    pq.write_table(tbl, str(src / "docs.parquet"))
    cfg = BuildConfig(num_shards=4, tokenize_batch_size=8)
    out = str(root / "idx")
    result = build_index(str(src), out, cfg)
    return {"table": tbl, "src": str(src), "out": out, "cfg": cfg, "result": result}


@pytest.fixture(scope="session")
def tiny_oracle(tiny_build):
    from rayindex.oracle import OracleEngine

    return OracleEngine(tiny_build["table"])


@pytest.fixture(scope="session")
def tiny_reader(tiny_build):
    from rayindex.searcher import IndexReader

    return IndexReader(tiny_build["out"])
