"""DB metadata sink (S6–S8, T6): round-trip parity, truncator gating,
retry idempotence, and concurrent actor-pool writers on one SQLite file."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from rayindex.db import (MetadataSink, create_table_sql, read_table,
                         sqlite_connect_fn, truncate_table)


def _meta_table(n: int = 40) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array([f"l{i % 3}" for i in range(n)]),
        "source": pa.array([f"s/{i}" for i in range(n)]),
        "n_chars": pa.array([10 * i for i in range(n)], pa.int64()),
    })


def _fresh_db(tmp_path, name="meta.sqlite"):
    return sqlite_connect_fn(os.path.join(str(tmp_path), name))


COLS = ["doc_id", "lang", "source", "n_chars"]


def test_sink_roundtrip_and_upsert(tmp_path):
    cf = _fresh_db(tmp_path)
    t = _meta_table()
    sink = MetadataSink(cf, "doc_metadata", COLS, create_from=t.schema)
    out = sink(t)
    assert out["rows_written"][0].as_py() == t.num_rows
    # a Ray retry re-sends the same batch: upsert keeps it idempotent
    sink(t)
    back = read_table(cf, "doc_metadata", COLS).sort_by("doc_id")
    assert back.equals(t)


def test_sink_updates_on_conflict(tmp_path):
    cf = _fresh_db(tmp_path)
    t = _meta_table(8)
    sink = MetadataSink(cf, "doc_metadata", COLS, create_from=t.schema)
    sink(t)
    t2 = t.set_column(1, "lang", pa.array(["xx"] * 8))
    sink(t2)
    back = read_table(cf, "doc_metadata", COLS).sort_by("doc_id")
    assert back["lang"].to_pylist() == ["xx"] * 8
    assert back.num_rows == 8


def test_truncate_requires_force(tmp_path):
    cf = _fresh_db(tmp_path)
    t = _meta_table(5)
    MetadataSink(cf, "doc_metadata", COLS, create_from=t.schema)(t)
    with pytest.raises(ValueError, match="force=True"):
        truncate_table(cf, "doc_metadata")
    truncate_table(cf, "doc_metadata", force=True)
    assert read_table(cf, "doc_metadata", COLS).num_rows == 0
    # absent table: error unless missing_ok
    with pytest.raises(Exception):
        truncate_table(cf, "nope", force=True)
    assert truncate_table(cf, "nope", force=True, missing_ok=True) == 0


def test_identifier_validation(tmp_path):
    cf = _fresh_db(tmp_path)
    with pytest.raises(ValueError, match="unsafe"):
        MetadataSink(cf, "doc_metadata; DROP TABLE x", COLS)
    with pytest.raises(ValueError, match="unsafe"):
        MetadataSink(cf, "doc_metadata", ["doc_id", "bad col"])
    with pytest.raises(ValueError, match="unsafe"):
        truncate_table(cf, "x y", force=True)


def test_create_table_sql_types():
    t = _meta_table(1)
    ddl = create_table_sql("m", t.schema, "doc_id")
    assert "doc_id BIGINT PRIMARY KEY" in ddl
    assert "lang TEXT" in ddl and "IF NOT EXISTS" in ddl


def test_sink_reconnects_after_failure(tmp_path):
    """A dropped connection mid-stream is retried against a fresh one
    (T6 reconnect semantics) with no rows lost or duplicated."""
    cf = _fresh_db(tmp_path)
    t = _meta_table(12)
    sink = MetadataSink(cf, "doc_metadata", COLS, create_from=t.schema,
                        backoff_s=0.01)
    sink(t.slice(0, 6))
    sink._conn.close()  # simulate a dead server connection
    sink(t.slice(6, 6))
    back = read_table(cf, "doc_metadata", COLS).sort_by("doc_id")
    assert back.equals(t)


def test_actor_pool_concurrent_writers(ray_session, tmp_path):
    """concurrency=2 actors interleave executemany commits on one SQLite
    file (WAL + busy_timeout): every row lands exactly once."""
    import ray.data

    cf = _fresh_db(tmp_path)
    t = _meta_table(200)
    ds = ray.data.from_arrow(t)
    total = ds.map_batches(
        MetadataSink, batch_format="pyarrow", concurrency=2, batch_size=25,
        fn_constructor_kwargs=dict(connect_fn=cf, table="doc_metadata",
                                   columns=COLS, create_from=t.schema),
    ).sum("rows_written")
    assert total == 200
    back = read_table(cf, "doc_metadata", COLS).sort_by("doc_id")
    assert back.equals(t)
